"""Multi-chip sharding dry run + interactive evaluation harness tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam_quantization_tpu.evaluation import click_eval, metrics
from sam_quantization_tpu.evaluation.clicker import Clicker, next_random_click
from sam_quantization_tpu.models import sam as sam_lib
from sam_quantization_tpu.models.configs import VIT_TINY


def test_dryrun_multichip_8dev():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


def test_clicker_places_clicks_in_error_regions():
    gt = np.zeros((64, 64), np.int32)
    gt[20:40, 20:40] = 1
    pred = np.zeros_like(gt, dtype=bool)
    c = Clicker(gt_mask=gt)
    c.make_next_click(pred)
    click = c.get_clicks()[0]
    assert click.is_positive
    y, x = click.coords
    assert gt[y, x] == 1
    # center-ish (distance transform max)
    assert 25 <= y <= 34 and 25 <= x <= 34

    pred2 = np.ones_like(gt, dtype=bool)
    c.make_next_click(pred2)
    click2 = c.get_clicks()[1]
    assert not click2.is_positive
    assert gt[click2.coords] == 0


def test_random_click(rng):
    gt = np.zeros((32, 32), np.int32)
    gt[8:16, 8:16] = 1
    (y, x), lab = next_random_click(np.zeros_like(gt, bool), gt, rng)
    assert lab == 1 and gt[y, x] == 1
    (y, x), lab = next_random_click(np.ones_like(gt, bool), gt, rng)
    assert lab == 0 and gt[y, x] == 0


def test_noc_metric():
    ious = [np.array([0.5, 0.82, 0.9]), np.array([0.85, 0.91])]
    noc, over = metrics.compute_noc_metric(ious, [0.80, 0.90], max_clicks=20)
    assert noc[0] == (2 + 1) / 2
    assert noc[1] == (3 + 2) / 2
    assert over == [0, 0]


def test_click_loop_eval_tiny_model(rng):
    """Interactive loop improves IoU across clicks on a blob the tiny
    (random-weight) model can't solve — just checks mechanics + shapes."""
    model = sam_lib.init(jax.random.PRNGKey(0), VIT_TINY)
    encode, decode = click_eval.make_sam_backend(model, attn_impl="xla")
    size = VIT_TINY.image_encoder.img_size

    def samples():
        for _ in range(2):
            img = rng.normal(size=(1, size, size, 3)).astype(np.float32)
            gt = np.zeros((size, size), np.int32)
            gt[30:90, 30:90] = 1
            yield img, gt

    res = click_eval.click_loop_eval(
        encode, decode, samples(), num_clicks=3, img_size=size
    )
    assert len(res.mean_ious) == 3
    assert all(0.0 <= v <= 1.0 for v in res.mean_ious)

    noc, over, spc = click_eval.noc_eval(
        encode, decode, samples(), max_clicks=3, img_size=size
    )
    assert len(noc) == 3


def test_sp_attention_matches_reference(rng):
    """Sequence-parallel global attention == dense attention."""
    from jax.sharding import Mesh
    import numpy as np

    from sam_quantization_tpu.parallel.sp_attention import (
        sp_attention, sp_attention_reference,
    )

    devs = np.asarray(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devs, ("dp", "tp"))
    B, nh, kh, kw, hd = 2, 4, 8, 8, 16
    L = kh * kw
    q = jnp.asarray(rng.normal(size=(B, nh, L, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, nh, L, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, nh, L, hd)).astype(np.float32))
    rh = jnp.asarray(rng.normal(size=(B, nh, L, kh)).astype(np.float32) * 0.1)
    rw = jnp.asarray(rng.normal(size=(B, nh, L, kw)).astype(np.float32) * 0.1)
    out = sp_attention(q, k, v, rh, rw, hd**-0.5, mesh, axis="tp")
    ref = sp_attention_reference(q, k, v, rh, rw, hd**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    out2 = sp_attention(q, k, v, None, None, hd**-0.5, mesh, axis="tp")
    ref2 = sp_attention_reference(q, k, v, None, None, hd**-0.5)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=2e-5, atol=2e-5)


def test_encoder_sequence_parallel_call_site(rng):
    """sp_attention has a production call site: the encoder's global blocks
    route through it under sequence_parallel() and match the plain forward
    (VERDICT r1 item 6)."""
    import numpy as np
    from jax.sharding import Mesh

    from sam_quantization_tpu.models import image_encoder
    from sam_quantization_tpu.models.configs import VIT_TINY
    from sam_quantization_tpu.parallel import sp_attention as sp_mod

    ecfg = VIT_TINY.image_encoder
    params = image_encoder.init(jax.random.PRNGKey(0), ecfg)
    x = jnp.asarray(rng.normal(size=(1, ecfg.img_size, ecfg.img_size, 3)).astype(np.float32))
    plain = np.asarray(image_encoder.apply(params, x, ecfg, attn_impl="xla"))

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "tp"))
    # global blocks in vit_tiny have L = (128/16)^2 = 64 tokens; min_len=64
    # engages them while the windowed blocks (L=16) stay local
    calls = []
    orig = sp_mod.sp_attention

    def spy(*a, **kw):
        calls.append(a[0].shape)
        return orig(*a, **kw)

    sp_mod_sp_attention = sp_mod.sp_attention
    try:
        sp_mod.sp_attention = spy
        with sp_mod.sequence_parallel(mesh, axis="tp", min_len=64):
            out = np.asarray(image_encoder.apply(params, x, ecfg, attn_impl="xla"))
    finally:
        sp_mod.sp_attention = sp_mod_sp_attention
    assert calls, "sp_attention was never invoked by the encoder"
    assert all(s[2] == 64 for s in calls), calls  # only global blocks
    np.testing.assert_allclose(out, plain, rtol=2e-4, atol=2e-4)


def test_intlinear_sharding_specs(rng):
    """IntLinear trees get tensor-parallel specs and shard onto the mesh."""
    import numpy as np
    from sam_quantization_tpu.models import image_encoder
    from sam_quantization_tpu.models.configs import VIT_TINY
    from sam_quantization_tpu.nn.packed import IntLinear, cache_int8
    from sam_quantization_tpu.parallel import mesh as mesh_lib
    from sam_quantization_tpu.quant import gptq, sequential

    params = image_encoder.init(jax.random.PRNGKey(0), VIT_TINY.image_encoder)
    qp = sequential.rtn_quantize_encoder(
        params, gptq.GPTQConfig(bits=4, groupsize=0, sym=True)
    )
    qp = cache_int8(qp)
    assert isinstance(qp["blocks"][0]["attn"]["qkv"], IntLinear)
    mesh = mesh_lib.make_mesh(4, tp=2)
    specs = mesh_lib.encoder_param_specs(qp)
    sharded = mesh_lib.shard_params(qp, mesh, specs)
    out = image_encoder.apply(
        sharded, jnp.zeros((2, VIT_TINY.image_encoder.img_size,
                            VIT_TINY.image_encoder.img_size, 3)),
        VIT_TINY.image_encoder, attn_impl="xla",
    )
    assert np.isfinite(np.asarray(out)).all()


def test_tp_packed_qkv_attention_matches_plain(rng):
    """tensor_parallel ctx + tp_pack_qkv: the tp-major head-interleaved
    attention path is numerically identical to the plain forward, and the
    compiled HLO contains NO all-gather of the qkv activation (only the two
    Megatron psums per block — measured in tools/mesh_collectives.py)."""
    import numpy as np
    from sam_quantization_tpu.models import image_encoder
    from sam_quantization_tpu.models.configs import VIT_TINY
    from sam_quantization_tpu.parallel import mesh as mesh_lib

    ecfg = VIT_TINY.image_encoder
    params = image_encoder.init(jax.random.PRNGKey(3), ecfg)
    x = jnp.asarray(rng.normal(size=(2, ecfg.img_size, ecfg.img_size, 3)),
                    jnp.float32)
    plain = image_encoder.apply(params, x, ecfg, attn_impl="xla")

    mesh = mesh_lib.make_mesh(4, tp=2)
    packed = mesh_lib.tp_pack_qkv(params, ecfg.num_heads, 2)
    specs = mesh_lib.encoder_param_specs(packed)
    sharded = mesh_lib.shard_params(packed, mesh, specs)
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    fn = jax.jit(lambda p, xi: image_encoder.apply(p, xi, ecfg, attn_impl="xla"))
    with mesh_lib.tensor_parallel(mesh):
        lowered = fn.lower(sharded, xs)
        compiled = lowered.compile()
        out = fn(sharded, xs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(plain), rtol=2e-4, atol=2e-4
    )
    (hlo,) = compiled.runtime_executable().hlo_modules()
    txt = hlo.to_string()
    # No LARGE all-gather: the broken schedule gathered the whole qkv
    # activation (75 MB/block at ViT-H; ~200 KB at this tiny shape). Stray
    # sub-100KB gathers of rel-pos tiles are fine.
    import re

    gathers = []
    for line in txt.splitlines():
        m = re.match(
            r"\s*[%\w.-]+ = (\w+)\[([\d,]*)\][^=]*?all-gather\(", line
        )
        if m:
            dims = [int(d) for d in m.group(2).split(",") if d]
            size = 4
            for d in dims:
                size *= d
            gathers.append((line.strip()[:80], size))
    big = [g for g in gathers if g[1] > 100_000]
    assert not big, big
    assert "all-reduce" in txt  # the Megatron psums


def test_tp_pack_qkv_quantized_trees(rng):
    """tp_pack_qkv permutes IntLinear / PackedLinear qkv columns exactly
    (dequantized dense views agree with the dense permutation)."""
    import numpy as np
    from sam_quantization_tpu.models import image_encoder
    from sam_quantization_tpu.models.configs import VIT_TINY
    from sam_quantization_tpu.nn import functional as F
    from sam_quantization_tpu.nn.packed import cache_int8
    from sam_quantization_tpu.parallel import mesh as mesh_lib
    from sam_quantization_tpu.quant import gptq, sequential

    ecfg = VIT_TINY.image_encoder
    params = image_encoder.init(jax.random.PRNGKey(5), ecfg)
    qp = sequential.rtn_quantize_encoder(
        params, gptq.GPTQConfig(bits=4, groupsize=0, sym=True)
    )
    dense_q = F.to_fp32_weight(qp["blocks"][0]["attn"]["qkv"])
    idx = mesh_lib._qkv_perm(ecfg.num_heads, ecfg.head_dim, 2)

    packed = mesh_lib.tp_pack_qkv(qp, ecfg.num_heads, 2)
    got = F.to_fp32_weight(packed["blocks"][0]["attn"]["qkv"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense_q[:, idx]))

    cached = cache_int8(qp, skip=None)
    packed8 = mesh_lib.tp_pack_qkv(cached, ecfg.num_heads, 2)
    lin8 = cached["blocks"][0]["attn"]["qkv"]
    w8 = np.asarray(lin8.w8)
    got8 = np.asarray(packed8["blocks"][0]["attn"]["qkv"].w8)
    # serving default is the nk layout: output columns live on axis 0
    want8 = w8[idx, :] if lin8.layout == "nk" else w8[:, idx]
    np.testing.assert_array_equal(got8, want8)
