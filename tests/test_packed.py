"""Pack/unpack/dequantize round-trip and quant-matmul parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_quantization_tpu.nn import packed
from sam_quantization_tpu.ops import quant_matmul


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
@pytest.mark.parametrize("K,groupsize", [(256, 0), (256, 128), (512, 64), (64, 0)])
def test_pack_roundtrip(bits, K, groupsize, rng):
    N = 128
    maxq = (1 << bits) - 1
    w_int = rng.integers(0, maxq + 1, size=(K, N)).astype(np.int32)
    g = groupsize if groupsize > 0 else K
    scales = rng.uniform(0.01, 0.1, size=(K // g, N)).astype(np.float32)
    zeros = rng.integers(0, maxq + 1, size=(K // g, N)).astype(np.float32)
    p = packed.pack_int_weights(w_int, scales, zeros, None, bits, groupsize)
    got = np.asarray(packed.unpack_to_int(p))
    np.testing.assert_array_equal(got, w_int)
    w = np.asarray(packed.dequantize(p))
    want = (w_int.reshape(K // g, g, N) - zeros[:, None, :]) * scales[:, None, :]
    np.testing.assert_allclose(w, want.reshape(K, N), rtol=1e-6)


def test_rtn_reconstruction(rng):
    w = rng.normal(size=(256, 128)).astype(np.float32)
    p = packed.quantize_rtn(jnp.asarray(w), bits=8, groupsize=64)
    wq = np.asarray(packed.dequantize(p))
    assert np.abs(wq - w).max() < 0.05  # int8 grid error bound


@pytest.mark.parametrize("M,K,N,groupsize", [(64, 256, 128, 128), (100, 512, 256, 0)])
def test_quant_matmul_xla_matches_dense(M, K, N, groupsize, rng):
    w = rng.normal(size=(K, N)).astype(np.float32)
    x = rng.normal(size=(M, K)).astype(np.float32)
    p = packed.quantize_rtn(jnp.asarray(w), bits=4, groupsize=groupsize)
    wq = packed.dequantize(p)
    want = x @ np.asarray(wq)
    got = np.asarray(quant_matmul.quant_matmul_xla(jnp.asarray(x), p))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("M,K,N,groupsize,bits", [
    (64, 256, 128, 128, 4),
    (100, 512, 256, 0, 4),
    (32, 256, 384, 64, 8),
    (64, 256, 128, 128, 3),  # split-plane 3-bit (_qmm_kernel3)
    (32, 512, 256, 0, 3),
])
def test_quant_matmul_pallas_interpret(M, K, N, groupsize, bits, rng):
    """Fused kernel (interpret mode) vs XLA dequant path."""
    w = rng.normal(size=(K, N)).astype(np.float32)
    x = rng.normal(size=(M, K)).astype(np.float32)
    p = packed.quantize_rtn(jnp.asarray(w), bits=bits, groupsize=groupsize)
    want = np.asarray(quant_matmul.quant_matmul_xla(jnp.asarray(x), p))

    quant_matmul.INTERPRET = True
    try:
        got = np.asarray(quant_matmul.quant_matmul_pallas(jnp.asarray(x), p))
    finally:
        quant_matmul.INTERPRET = False
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("M,K,N,groupsize", [(64, 256, 128, 128), (100, 512, 256, 0)])
def test_quant_matmul_a8(M, K, N, groupsize, rng):
    """W4A8 path: pallas-interpret vs XLA simulation vs fp reference."""
    import dataclasses

    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    x = rng.normal(size=(M, K)).astype(np.float32)
    p = packed.quantize_rtn(jnp.asarray(w), bits=4, groupsize=groupsize)
    p = dataclasses.replace(p, act_bits=8)
    want = np.asarray(quant_matmul.quant_matmul_a8_xla(jnp.asarray(x), p))
    quant_matmul.INTERPRET = True
    try:
        got = np.asarray(quant_matmul.quant_matmul_a8_pallas(jnp.asarray(x), p))
    finally:
        quant_matmul.INTERPRET = False
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # int8-activation error alone (vs the weight-only dequant matmul) is small
    ref_w4 = np.asarray(quant_matmul.quant_matmul_xla(jnp.asarray(x), p))
    rel = np.linalg.norm(got - ref_w4) / np.linalg.norm(ref_w4)
    assert rel < 0.02, rel


def test_quant_matmul_a8_w8_asym(rng):
    """Regression (ADVICE r1): bits=8 asymmetric grid spans [0,255]; the a8
    kernel must shift to int8 range instead of wrapping values > 127."""
    import dataclasses

    M, K, N = 64, 256, 128
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05 + 0.08  # skewed → asym
    x = rng.normal(size=(M, K)).astype(np.float32)
    p = packed.quantize_rtn(jnp.asarray(w), bits=8, groupsize=128, sym=False)
    p = dataclasses.replace(p, act_bits=8)
    want = np.asarray(quant_matmul.quant_matmul_a8_xla(jnp.asarray(x), p))
    quant_matmul.INTERPRET = True
    try:
        got = np.asarray(quant_matmul.quant_matmul_a8_pallas(jnp.asarray(x), p))
    finally:
        quant_matmul.INTERPRET = False
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_with_act_bits_transform():
    p = packed.quantize_rtn(jnp.ones((64, 128)), bits=4, groupsize=64)
    tree = {"a": {"lin": p}, "b": jnp.zeros(3)}
    out = packed.with_act_bits(tree, 8)
    assert out["a"]["lin"].act_bits == 8
    assert tree["a"]["lin"].act_bits == 0


def test_fused_mlp_interpret(rng):
    from sam_quantization_tpu.ops import fused_mlp

    K, H, M = 128, 512, 64
    w1 = rng.normal(size=(K, H)).astype(np.float32) * 0.05
    b1 = rng.normal(size=(H,)).astype(np.float32) * 0.01
    w2 = rng.normal(size=(H, K)).astype(np.float32) * 0.05
    b2 = rng.normal(size=(K,)).astype(np.float32) * 0.01
    x = rng.normal(size=(M, K)).astype(np.float32)
    p1 = packed.quantize_rtn(jnp.asarray(w1), 4, 128, bias=jnp.asarray(b1))
    p2 = packed.quantize_rtn(jnp.asarray(w2), 4, 128, bias=jnp.asarray(b2))

    # XLA fallback reference
    want = np.asarray(fused_mlp.fused_mlp(jnp.asarray(x), p1, p2))
    quant_matmul.INTERPRET = True
    try:
        got = np.asarray(fused_mlp.fused_mlp(jnp.asarray(x), p1, p2))
    finally:
        quant_matmul.INTERPRET = False
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("groupsize", [0, 128])
def test_quant_matmul_a8_sym(groupsize, rng):
    """Symmetric pure-integer fast path vs XLA simulation."""
    import dataclasses

    K, N, M = 256, 256, 64
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    x = rng.normal(size=(M, K)).astype(np.float32)
    p = packed.quantize_rtn(jnp.asarray(w), bits=4, groupsize=groupsize, sym=True)
    assert p.sym
    p = dataclasses.replace(p, act_bits=8)
    want = np.asarray(quant_matmul.quant_matmul_a8_xla(jnp.asarray(x), p))
    quant_matmul.INTERPRET = True
    try:
        got = np.asarray(quant_matmul.quant_matmul_a8_pallas(jnp.asarray(x), p))
    finally:
        quant_matmul.INTERPRET = False
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("groupsize", [0, 64])
def test_quant_matmul_a8_sym_native(groupsize, rng):
    import dataclasses

    K, N, M = 256, 256, 32
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    x = rng.normal(size=(M, K)).astype(np.float32)
    p = packed.quantize_rtn(jnp.asarray(w), bits=4, groupsize=groupsize, sym=True)
    p = dataclasses.replace(p, act_bits=8)
    got = np.asarray(quant_matmul.quant_matmul_a8_sym_native(jnp.asarray(x), p))
    want = np.asarray(quant_matmul.quant_matmul_a8_xla(jnp.asarray(x), p))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_int_linear_cached(rng):
    """cache_int8 → IntLinear dispatch matches the packed a8-native path."""
    import dataclasses
    from sam_quantization_tpu.nn import functional as F
    from sam_quantization_tpu.nn.packed import IntLinear, cache_int8

    K, N, M = 256, 256, 32
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    b = rng.normal(size=(N,)).astype(np.float32) * 0.01
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    p = packed.quantize_rtn(jnp.asarray(w), bits=4, groupsize=64, sym=True,
                            bias=jnp.asarray(b))
    p8 = dataclasses.replace(p, act_bits=8)
    tree = cache_int8({"lin": p})
    lin = tree["lin"]
    assert isinstance(lin, IntLinear) and lin.w8.dtype == jnp.int8
    got = np.asarray(F.linear(lin, x))
    want = np.asarray(quant_matmul.quant_matmul_a8_xla(x, p8) + jnp.asarray(b))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_int_linear_static_act_scale(rng):
    """Static (calibrated) activation scale matches the dynamic path closely
    and produces a scalar in_scale leaf on the IntLinear."""
    from sam_quantization_tpu.nn import functional as F
    from sam_quantization_tpu.nn.packed import cache_int8

    K, N, M = 256, 128, 16
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    p = packed.quantize_rtn(jnp.asarray(w), bits=4, groupsize=64, sym=True)
    amax = float(jnp.max(jnp.abs(x)))
    tree_dyn = cache_int8({"lin": p})
    tree_sta = cache_int8({"lin": p}, act_scales={"lin": amax})
    assert tree_sta["lin"].in_scale is not None
    got = np.asarray(F.linear(tree_sta["lin"], x))
    want = np.asarray(F.linear(tree_dyn["lin"], x))
    dense = x @ w
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
    # static path must still be an accurate linear (int4 weight error dominates)
    cos = float(
        (got * dense).sum()
        / (np.linalg.norm(got) * np.linalg.norm(dense) + 1e-9)
    )
    assert cos > 0.99, cos


def test_int_linear_nk_layout(rng):
    """transpose=True stores (N, K) weights (layout='nk') — the faster
    measured int8 dot layout — with results identical to 'kn' across the
    dynamic, static-scale, and int8-pre input modes, and with tp column
    slicing still exact."""
    import dataclasses
    from sam_quantization_tpu.nn import functional as F
    from sam_quantization_tpu.nn.packed import IntLinear, cache_int8
    from sam_quantization_tpu.ops import quant_matmul

    K, N, M = 256, 128, 16
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    p = packed.quantize_rtn(jnp.asarray(w), bits=4, groupsize=64, sym=True)
    amax = float(jnp.max(jnp.abs(x)))
    for scales in (None, {"lin": amax}):
        t_kn = cache_int8({"lin": p}, act_scales=scales, transpose=False)
        t_nk = cache_int8({"lin": p}, act_scales=scales)  # nk is the default
        assert t_nk["lin"].layout == "nk"
        assert t_nk["lin"].w8.shape == (N, K)
        assert t_nk["lin"].in_features == K
        assert t_nk["lin"].out_features == N
        np.testing.assert_array_equal(
            np.asarray(t_nk["lin"].w8).T, np.asarray(t_kn["lin"].w8)
        )
        got = np.asarray(F.linear(t_nk["lin"], x))
        want = np.asarray(F.linear(t_kn["lin"], x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # int8-pre input (the flash int8-out epilogue's hand-off)
    lin_nk = cache_int8({"lin": p}, act_scales={"lin": amax},
                        transpose=True)["lin"]
    lin_kn = cache_int8({"lin": p}, act_scales={"lin": amax},
                        transpose=False)["lin"]
    assert lin_kn.layout == "kn" and lin_nk.layout == "nk"
    xq = jnp.clip(
        jnp.round(x / lin_kn.in_scale), -127, 127
    ).astype(jnp.int8)
    np.testing.assert_allclose(
        np.asarray(quant_matmul.int8_matmul(xq, lin_nk)),
        np.asarray(quant_matmul.int8_matmul(xq, lin_kn)),
        rtol=1e-5, atol=1e-5,
    )
    # tp output-column slice (parallel.mesh.tp_pack_qkv permute path)
    idx = np.arange(N)[::-1].copy()
    sliced = dataclasses.replace(
        lin_nk,
        w8=lin_nk.w8[jnp.asarray(idx), :],
        scales=lin_nk.scales[:, jnp.asarray(idx)],
    )
    np.testing.assert_allclose(
        np.asarray(F.linear(sliced, x)),
        np.asarray(F.linear(lin_kn, x))[:, idx],
        rtol=1e-5, atol=1e-5,
    )


def test_int_linear_per_channel_requant(rng):
    """Grouped weights requantize to ONE per-column int8 grid (single MXU
    dot, no (G, M, N) accumulator) with error far below the int4 grid's."""
    from sam_quantization_tpu.nn import functional as F
    from sam_quantization_tpu.nn.packed import cache_int8, dequantize

    K, N, M = 256, 128, 16
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    p = packed.quantize_rtn(jnp.asarray(w), bits=4, groupsize=32, sym=True)
    t_pc = cache_int8({"lin": p})  # per-channel is the default
    t_gr = cache_int8({"lin": p}, per_channel=False)
    assert t_pc["lin"].scales.shape == (1, N)
    assert t_gr["lin"].scales.shape == (K // 32, N)
    # requantized weights vs the exact dequantized int4 weights: < 1% rel
    w_exact = np.asarray(dequantize(p, jnp.float32))
    w8_kn = np.asarray(t_pc["lin"].w8, np.float32)
    if t_pc["lin"].layout == "nk":  # serving default stores (N, K)
        w8_kn = w8_kn.T
    w_pc = w8_kn * np.asarray(t_pc["lin"].scales)
    rel = np.abs(w_pc - w_exact).max() / np.abs(w_exact).max()
    assert rel < 0.01, rel
    got = np.asarray(F.linear(t_pc["lin"], x))
    want = np.asarray(F.linear(t_gr["lin"], x))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_calibrate_act_scales_paths(rng):
    """calibrate_act_scales returns an amax per encoder linear whose keys
    match the cache_int8 walk paths."""
    from sam_quantization_tpu.models import image_encoder
    from sam_quantization_tpu.models.configs import VIT_TINY
    from sam_quantization_tpu.nn.packed import IntLinear, cache_int8
    from sam_quantization_tpu.quant import gptq, sequential
    from sam_quantization_tpu.quant.act_scales import calibrate_act_scales

    ecfg = VIT_TINY.image_encoder
    params = image_encoder.init(jax.random.PRNGKey(0), ecfg)
    x = jnp.asarray(rng.normal(size=(1, ecfg.img_size, ecfg.img_size, 3)),
                    jnp.float32)
    scales = calibrate_act_scales(params, ecfg, [x])
    assert scales and all(v > 0 for v in scales.values())
    qp = sequential.rtn_quantize_encoder(
        params, gptq.GPTQConfig(bits=4, groupsize=0, sym=True)
    )
    qp = cache_int8(qp, act_scales=scales)
    qkv = qp["blocks"][0]["attn"]["qkv"]
    assert isinstance(qkv, IntLinear) and qkv.in_scale is not None
    out = image_encoder.apply(qp, x, ecfg, attn_impl="xla")
    assert np.isfinite(np.asarray(out)).all()


def test_cache_int8_act_scales_for_dense_skipped_layer(rng):
    """A calibrated act_scales key that lands on a layer left FP-dense
    (QuantOverrides skip rule → plain {'w': ...} node) must NOT trip the
    unmatched-keys guard — the calibration ctx records every linear's
    input, quantized or not (quant/act_scales.py). Truly bogus keys
    (matching no linear-shaped node at all) must still raise."""
    import pytest
    from sam_quantization_tpu.nn.packed import IntLinear, cache_int8

    w = rng.normal(size=(64, 32)).astype(np.float32) * 0.05
    p = packed.quantize_rtn(jnp.asarray(w), bits=4, groupsize=0, sym=True)
    dense = {"w": jnp.asarray(w), "b": jnp.zeros((32,), jnp.float32)}
    tree = {"q": p, "skipped": dense}
    out = cache_int8(tree, act_scales={"q": 3.0, "skipped": 2.0}, skip=None)
    assert isinstance(out["q"], IntLinear) and out["q"].in_scale is not None
    assert isinstance(out["skipped"], dict)  # untouched dense node
    with pytest.raises(ValueError, match="matched no quantized linear"):
        cache_int8(tree, act_scales={"blocks.0.attn.qkv": 1.0}, skip=None)


def test_autotune_candidates_and_table(tmp_path):
    from sam_quantization_tpu.ops import autotune

    cands = autotune.candidate_blocks(4096, 3840, 1280, 128, 128)
    assert all(3840 % bn == 0 and 1280 % bk == 0 for _, bn, bk in cands)
    assert len(cands) > 3
    # table round trip
    path = str(tmp_path / "tab.json")
    import json
    json.dump({"4096x1280x3840g128b4": [256, 256, 512]}, open(path, "w"))
    autotune._table = None
    autotune.load_table(path)
    assert autotune.lookup(4096, 1280, 3840, 128, 4) == (256, 256, 512)
    autotune._table = None  # reset global for other tests


def test_clamp_window_canary():
    """check_clamp_window (advisor r4: a runtime canary that calibrated
    logit ranges stay inside the serving kernels' clamp window)."""
    import warnings

    from sam_quantization_tpu.ops.flash_attention import (
        _CLAMP_CAPE, _CLAMP_FLOORE,
    )
    from sam_quantization_tpu.quant.act_scales import check_clamp_window

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert check_clamp_window(0.0, _CLAMP_CAPE - 1.0)  # in-window: silent
        # large-magnitude NEGATIVE logits are exact under the clamp (they
        # clip to the floor of an already-negligible tail) — the observer
        # records the POSITIVE max for the cap check, so a -50 tail with an
        # in-window row max must stay silent (a prior abs-max formulation
        # false-positived here)
        import numpy as np

        from sam_quantization_tpu.quant.act_scales import InputAmaxCtx

        ctx = InputAmaxCtx()
        logits = np.full((2, 4, 8), -50.0, np.float32)
        logits[:, :, 0] = 5.0  # every row's max is in-window
        ctx.act("blocks.0.attn.rel_pos_qact", logits)
        mn, mx = ctx.logit_stats["blocks.0.attn.rel_pos_qact"]
        assert check_clamp_window(float(mn), float(mx))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert not check_clamp_window(_CLAMP_FLOORE - 5.0, 10.0)
        assert not check_clamp_window(0.0, _CLAMP_CAPE + 5.0)
        assert len(w) == 2
    # quiet mode for programmatic checks
    assert not check_clamp_window(_CLAMP_FLOORE - 1.0, 1.0, warn=False)


def test_calibration_emits_clamp_canary_warning(rng):
    """calibrate_act_scales observes eager attention logits; a model whose
    logits leave the clamp window must warn at calibration time."""
    import warnings

    import jax
    import jax.numpy as jnp

    from sam_quantization_tpu.models import image_encoder
    from sam_quantization_tpu.models.configs import VIT_TINY
    from sam_quantization_tpu.quant.act_scales import calibrate_act_scales

    ecfg = VIT_TINY.image_encoder
    params = image_encoder.init(jax.random.PRNGKey(0), ecfg)
    # blow up the first block's qkv so attention logits leave the window
    params["blocks"][0]["attn"]["qkv"]["w"] = (
        params["blocks"][0]["attn"]["qkv"]["w"] * 400.0
    )
    x = jnp.asarray(rng.normal(size=(1, ecfg.img_size, ecfg.img_size, 3)),
                    jnp.float32) * 3.0
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        scales = calibrate_act_scales(params, ecfg, [x])
    assert scales  # calibration itself still succeeds
    assert any("clamp" in str(x.message) for x in w)
