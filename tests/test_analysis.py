"""Per-op SNR analysis tests (graphwise + layerwise)."""

import numpy as np
import jax
import jax.numpy as jnp

from sam_quantization_tpu.models import image_encoder
from sam_quantization_tpu.models.configs import VIT_TINY
from sam_quantization_tpu.quant import analysis, gptq, sequential

ECFG = VIT_TINY.image_encoder


def test_graphwise_and_layerwise_snr(rng):
    params = image_encoder.init(jax.random.PRNGKey(0), ECFG)
    batches = [
        jnp.asarray(rng.normal(size=(1, ECFG.img_size, ECFG.img_size, 3)).astype(np.float32))
    ]
    q8 = sequential.rtn_quantize_encoder(params, gptq.GPTQConfig(bits=8, groupsize=32))
    q2 = sequential.rtn_quantize_encoder(params, gptq.GPTQConfig(bits=2, groupsize=32))

    snr8 = analysis.graphwise_error_analyse(params, q8, ECFG, batches)
    snr2 = analysis.graphwise_error_analyse(params, q2, ECFG, batches)
    assert len(snr8) >= ECFG.depth * 4
    mean8 = np.mean(list(snr8.values()))
    mean2 = np.mean(list(snr2.values()))
    assert mean8 > mean2 + 10  # int8 much cleaner than int2
    assert mean8 > 30

    lw = analysis.layerwise_error_analyse(params, q8, ECFG, batches)
    assert len(lw) == ECFG.depth * 4
    assert np.mean(list(lw.values())) > 30
    report = analysis.format_report(snr8)
    assert "SNR" in report


def test_overrides_matching_and_roundtrip():
    from sam_quantization_tpu.quant.overrides import OpOverride, QuantOverrides

    ov = QuantOverrides()
    ov.add("blocks.*.mlp.*", bits=8)
    ov.add("blocks.3.mlp.lin2", skip=True)
    assert ov.match("blocks.0.mlp.lin1").bits == 8
    assert ov.match("blocks.0.attn.qkv") is None
    hit = ov.match("blocks.3.mlp.lin2")
    assert hit.skip and hit.bits == 8  # rules merge, later wins
    ov2 = QuantOverrides.from_json(ov.to_json())
    assert ov2.match("blocks.1.mlp.lin2").bits == 8
    assert ov2.match("blocks.3.mlp.lin2").skip


def test_bump_worst_snr_improves_e2e(rng):
    """Diagnose (layerwise SNR at 2-bit) → act (bump worst ops to 8-bit):
    the per-op PPQ capability end to end (ref custimized_quant.py:56-147)."""
    from sam_quantization_tpu.quant.overrides import QuantOverrides

    params = image_encoder.init(jax.random.PRNGKey(0), ECFG)
    batches = [
        jnp.asarray(rng.normal(size=(1, ECFG.img_size, ECFG.img_size, 3)).astype(np.float32))
    ]
    qcfg = gptq.GPTQConfig(bits=2, groupsize=32)
    q_base = sequential.rtn_quantize_encoder(params, qcfg)
    lw = analysis.layerwise_error_analyse(params, q_base, ECFG, batches)
    ov = QuantOverrides.bump_worst_snr(lw, k=4, bits=8)
    assert len(ov.rules) == 4
    q_mixed = sequential.rtn_quantize_encoder(params, qcfg, overrides=ov)
    # bumped layers actually became 8-bit
    bumped_path = ov.rules[0][0]
    node = q_mixed
    for part in bumped_path.split("."):
        node = node[int(part)] if isinstance(node, list) else node[part]
    assert node.bits == 8

    fp = np.asarray(image_encoder.apply(params, batches[0], ECFG, attn_impl="xla"))
    out_base = np.asarray(image_encoder.apply(q_base, batches[0], ECFG, attn_impl="xla"))
    out_mixed = np.asarray(image_encoder.apply(q_mixed, batches[0], ECFG, attn_impl="xla"))
    snr_base = float(analysis.snr_db(jnp.asarray(fp), jnp.asarray(out_base)))
    snr_mixed = float(analysis.snr_db(jnp.asarray(fp), jnp.asarray(out_mixed)))
    assert snr_mixed > snr_base + 1.0, (snr_base, snr_mixed)


def test_skip_override_leaves_fp(rng):
    from sam_quantization_tpu.quant.overrides import QuantOverrides

    params = image_encoder.init(jax.random.PRNGKey(0), ECFG)
    ov = QuantOverrides().add("blocks.0.*", skip=True)
    q = sequential.rtn_quantize_encoder(
        params, gptq.GPTQConfig(bits=4, groupsize=32), overrides=ov
    )
    lin = q["blocks"][0]["attn"]["qkv"]
    assert isinstance(lin, dict) and "w" in lin  # untouched FP dict
    from sam_quantization_tpu.nn.packed import PackedLinear

    assert isinstance(q["blocks"][1]["attn"]["qkv"], PackedLinear)
