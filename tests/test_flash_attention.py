"""Parity tests for the fused attention kernel (interpret mode, CPU).

Pattern of the reference's own kernel self-test
(gptq_triton/fused_attention.py:363-418): same-shape kernel-vs-eager
comparison at SAM's two structural shapes — the 14x14 window (L=196, the
whole-problem-batched path) and a long global sequence (the row-block path).
The augmented-contraction bias formulation (q||rel tiles vs k||one-hot
selectors) must match the eager broadcast-add bias exactly up to bf16 dot
rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_quantization_tpu.ops.flash_attention import (
    attention_reference,
    flash_attention_relpos,
)


def _mk(rng, B, nh, L, hd, kh, kw, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(rng), 5)
    q = jax.random.normal(ks[0], (B, nh, L, hd), dtype) * 0.5
    k = jax.random.normal(ks[1], (B, nh, L, hd), dtype) * 0.5
    v = jax.random.normal(ks[2], (B, nh, L, hd), dtype)
    rel_h = jax.random.normal(ks[3], (B, nh, L, kh), dtype) * 0.3
    rel_w = jax.random.normal(ks[4], (B, nh, L, kw), dtype) * 0.3
    return q, k, v, rel_h, rel_w


@pytest.mark.parametrize(
    "B,nh,L,hd,kh,kw",
    [
        (3, 2, 196, 80, 14, 14),  # ViT-H windowed (batched whole-problem path)
        (2, 2, 196, 64, 14, 14),  # ViT-B/L windowed
        (1, 2, 1024, 64, 32, 32),  # long sequence (augmented row-block)
        (1, 2, 800, 64, 25, 32),  # padded long sequence (augmented row-block)
    ],
)
def test_flash_matches_eager(B, nh, L, hd, kh, kw):
    q, k, v, rel_h, rel_w = _mk(0, B, nh, L, hd, kh, kw)
    out = flash_attention_relpos(
        q, k, v, rel_h, rel_w, hd**-0.5, interpret=True
    )
    ref = attention_reference(q, k, v, rel_h, rel_w, hd**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_bias3d_variant():
    """Opt-in VPU-bias global kernel (bias3d=True) matches the reference;
    on v5e it ties the default augmented contraction (see kernel docstring)."""
    q, k, v, rel_h, rel_w = _mk(7, 1, 2, 1024, 64, 32, 32)
    out = flash_attention_relpos(
        q, k, v, rel_h, rel_w, 0.125, interpret=True, bias3d=True
    )
    ref = attention_reference(q, k, v, rel_h, rel_w, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_bias3d_int8_out_epilogue():
    """The global (bias3d) kernel's int8-out epilogue: emitted int8 at
    1/out_inv_scale must equal quantizing the bf16 output at that scale."""
    q, k, v, rel_h, rel_w = _mk(7, 1, 2, 1024, 64, 32, 32)
    ref = np.asarray(
        flash_attention_relpos(
            q, k, v, rel_h, rel_w, 0.125, interpret=True, bias3d=True
        ),
        np.float32,
    )
    scale = float(np.abs(ref).max()) / 127.0
    out8 = flash_attention_relpos(
        q, k, v, rel_h, rel_w, 0.125, interpret=True, bias3d=True,
        out_inv_scale=jnp.float32(1.0 / scale),
    )
    assert out8.dtype == jnp.int8
    want = np.clip(np.round(ref / scale), -127, 127)
    np.testing.assert_allclose(np.asarray(out8, np.float32), want, atol=1.0)
    # near-exact up to f32-vs-interpret rounding on .5 boundaries
    assert (np.asarray(out8, np.float32) != want).mean() < 5e-3


@pytest.mark.parametrize("bw,block_q", [(2, None), (6, None), (None, 128)])
def test_flash_dispatch_overrides(bw, block_q):
    """bw/block_q overrides (tools/flash_sweep.py knobs) keep exact parity
    with the default dispatch — they only re-tile the grid."""
    L = 196 if block_q is None else 1024
    kh = kw = 14 if block_q is None else 32
    q, k, v, rel_h, rel_w = _mk(3, 3, 2, L, 64, kh, kw)
    out = flash_attention_relpos(
        q, k, v, rel_h, rel_w, 0.125, interpret=True,
        bw_override=bw, block_q_override=block_q,
    )
    ref = attention_reference(q, k, v, rel_h, rel_w, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_env_int_gates(monkeypatch):
    """Malformed SAMQ_PACKED_BW/SAMQ_GLOBAL_BLOCK_Q values fail with a clear
    message instead of a bare int() ValueError, and an oversized
    SAMQ_PACKED_BW is clamped (with a warning) to the safe bw rather than
    reintroducing the measured NW>64 scoped-vmem compile failure."""
    import warnings as _warnings

    from sam_quantization_tpu.ops.flash_attention import (
        _env_int, flash_attention_qkv_packed,
    )

    monkeypatch.setenv("SAMQ_PACKED_BW", "fast")
    with pytest.raises(ValueError, match="SAMQ_PACKED_BW"):
        _env_int("SAMQ_PACKED_BW")
    monkeypatch.setenv("SAMQ_PACKED_BW", "4")
    assert _env_int("SAMQ_PACKED_BW") == 4
    monkeypatch.delenv("SAMQ_PACKED_BW", raising=False)
    assert _env_int("SAMQ_PACKED_BW") is None

    # NW=68 > 64 pins bw_max=1; an env bw=4 divides NW? 68 % 4 == 0 → the
    # override path engages and must clamp to 1 with a warning.
    qkv = jax.random.normal(jax.random.PRNGKey(3), (68, 196, 3 * 2 * 64))
    rel = jnp.zeros((68, 2, 196, 28), jnp.float32)
    monkeypatch.setenv("SAMQ_PACKED_BW", "4")
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        out = flash_attention_qkv_packed(
            qkv, rel, 64**-0.5, nh=2, hd=64, kh=14, kw=14, interpret=True
        )
    assert any("SAMQ_PACKED_BW" in str(w.message) for w in rec)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("exp2", ["1", "0"])
def test_flash_exp2_gate_parity(exp2, monkeypatch):
    """Both kernel variants — exp2 softmax with the log2(e) prescale folded
    into q/rel (default) and the SAMQ_FLASH_EXP2=0 opt-out (plain exp on
    unscaled logits) — must match the eager reference. The gate is read at
    trace time; flipping it changes a static jit argument, so each
    parametrization traces its own kernel."""
    if exp2 == "0":
        monkeypatch.setenv("SAMQ_FLASH_EXP2", "0")
    else:
        monkeypatch.delenv("SAMQ_FLASH_EXP2", raising=False)
    for B, nh, L, hd, kh, kw in [(2, 2, 196, 80, 14, 14), (1, 2, 1024, 64, 32, 32)]:
        q, k, v, rel_h, rel_w = _mk(5, B, nh, L, hd, kh, kw)
        out = flash_attention_relpos(
            q, k, v, rel_h, rel_w, hd**-0.5, interpret=True
        )
        ref = attention_reference(q, k, v, rel_h, rel_w, hd**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
    # packed-qkv windowed kernel under the same gate
    from sam_quantization_tpu.ops.flash_attention import (
        flash_attention_qkv_packed,
    )

    ks = jax.random.split(jax.random.PRNGKey(13), 2)
    qkv = jax.random.normal(ks[0], (2, 196, 3 * 2 * 80), jnp.float32) * 0.5
    rel = jax.random.normal(ks[1], (2, 2, 196, 28), jnp.float32) * 0.3
    out = flash_attention_qkv_packed(
        qkv, rel, 80**-0.5, nh=2, hd=80, kh=14, kw=14, interpret=True
    )
    q, k, v = (
        qkv.reshape(2, 196, 3, 2, 80).transpose(2, 0, 3, 1, 4)[i]
        for i in range(3)
    )
    ref = attention_reference(q, k, v, rel[..., :14], rel[..., 14:], 80**-0.5)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(ref.transpose(0, 2, 1, 3).reshape(2, 196, 160)),
        atol=2e-3,
    )


def test_flash_no_relpos():
    q, k, v, _, _ = _mk(1, 2, 2, 196, 64, 14, 14)
    out = flash_attention_relpos(q, k, v, None, None, 0.125, interpret=True)
    ref = attention_reference(q, k, v, None, None, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_bf16_window():
    q, k, v, rel_h, rel_w = _mk(2, 2, 2, 196, 80, 14, 14)
    cast = lambda t: t.astype(jnp.bfloat16)
    out = flash_attention_relpos(
        cast(q), cast(k), cast(v), cast(rel_h), cast(rel_w), 80**-0.5,
        interpret=True,
    )
    ref = attention_reference(q, k, v, rel_h, rel_w, 80**-0.5)
    assert jnp.mean(jnp.abs(out.astype(jnp.float32) - ref)) < 2e-2
    # cosine similarity, the reference self-test's metric
    a = np.asarray(out, np.float32).ravel()
    b = np.asarray(ref, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999


def test_flash_through_encoder_attention():
    """attn_impl='flash' vs 'xla' through the real encoder attention at a
    windowed shape (includes qkv/proj and the rel-pos tile precompute)."""
    from sam_quantization_tpu.models import image_encoder as ie
    from sam_quantization_tpu.models.configs import VIT_TINY

    cfg = VIT_TINY.image_encoder
    key = jax.random.PRNGKey(0)
    p = ie.init_block(key, cfg, 0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, cfg.embed_dim))
    xw, _ = ie.window_partition(x, cfg.window_size)
    import sam_quantization_tpu.ops.flash_attention as fa

    orig = fa._fused_attention
    orig_packed = fa._fused_attention_qkv_packed
    try:
        fa._fused_attention = lambda *a, **kw: orig(
            *a, **{**kw, "interpret": True}
        )
        fa._fused_attention_qkv_packed = lambda *a, **kw: orig_packed(
            *a, **{**kw, "interpret": True}
        )
        out_flash = ie.attention(p["attn"], xw, cfg, attn_impl="flash")
    finally:
        fa._fused_attention = orig
        fa._fused_attention_qkv_packed = orig_packed
    out_xla = ie.attention(p["attn"], xw, cfg, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), atol=3e-3
    )


@pytest.mark.parametrize(
    "NW,nh,L,hd,kh,kw,bw",
    [
        (3, 2, 196, 80, 14, 14, None),  # ViT-H windowed, padded Lp
        (2, 2, 256, 64, 16, 16, 2),  # exact Lp == L
    ],
)
def test_flash_qkv_packed_matches_eager(NW, nh, L, hd, kh, kw, bw):
    """The packed-qkv kernel (three BlockSpec views of one array, in-VMEM
    augmentation) matches the head-split reference exactly."""
    from sam_quantization_tpu.ops.flash_attention import (
        flash_attention_qkv_packed,
    )

    ks = jax.random.split(jax.random.PRNGKey(11), 2)
    qkv = jax.random.normal(ks[0], (NW, L, 3 * nh * hd), jnp.float32) * 0.5
    rel = jax.random.normal(ks[1], (NW, nh, L, kh + kw), jnp.float32) * 0.3
    out = flash_attention_qkv_packed(
        qkv, rel, hd**-0.5, nh=nh, hd=hd, kh=kh, kw=kw, interpret=True,
        bw_override=bw,
    )
    # head-split reference from the same packed activation
    q, k, v = (
        qkv.reshape(NW, L, 3, nh, hd).transpose(2, 0, 3, 1, 4)[i]
        for i in range(3)
    )
    rel_h, rel_w = rel[..., :kh], rel[..., kh:]
    ref = attention_reference(q, k, v, rel_h, rel_w, hd**-0.5)
    # reference is (NW, nh, L, hd) -> packed layout (NW, L, nh*hd)
    ref_packed = ref.transpose(0, 2, 1, 3).reshape(NW, L, nh * hd)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_packed), atol=2e-3
    )


@pytest.mark.parametrize("hoist_qkv", [False, True])
def test_hoisted_windowed_block_matches_partition_first(
    hoist_qkv, monkeypatch
):
    """The hoisted windowed path (proj below the unpartition; with
    SAMQ_HOIST_QKV=1 also qkv above the partition —
    models/image_encoder._attention_windowed_hoisted) must be numerically
    identical to partition-first through a FULL block: the qkv bias is
    re-added after partitioning so padded slots hold exactly bias.
    VIT_TINY's grid 8 / window 5 forces real padding (8 -> 10, 4 windows)."""
    import os

    from sam_quantization_tpu.models import image_encoder as ie
    from sam_quantization_tpu.models.configs import VIT_TINY
    import sam_quantization_tpu.ops.flash_attention as fa

    monkeypatch.setenv("SAMQ_HOIST_PROJ", "1")
    if hoist_qkv:
        monkeypatch.setenv("SAMQ_HOIST_QKV", "1")
    else:
        monkeypatch.delenv("SAMQ_HOIST_QKV", raising=False)

    cfg = VIT_TINY.image_encoder
    p = ie.init_block(jax.random.PRNGKey(3), cfg, 0)
    # nonzero bias + rel-pos tables so the padded-slot semantics matter
    p["attn"]["qkv"]["b"] = (
        jax.random.normal(jax.random.PRNGKey(4), (3 * cfg.embed_dim,)) * 0.1
    )
    p["attn"]["rel_pos_h"] = (
        jax.random.normal(jax.random.PRNGKey(5), p["attn"]["rel_pos_h"].shape)
        * 0.2
    )
    p["attn"]["rel_pos_w"] = (
        jax.random.normal(jax.random.PRNGKey(6), p["attn"]["rel_pos_w"].shape)
        * 0.2
    )
    x = jax.random.normal(
        jax.random.PRNGKey(7), (1, cfg.grid_size, cfg.grid_size, cfg.embed_dim)
    )
    orig_packed = fa._fused_attention_qkv_packed
    try:
        fa._fused_attention_qkv_packed = lambda *a, **kw: orig_packed(
            *a, **{**kw, "interpret": True}
        )
        assert ie._use_hoisted_windowed(
            ie.NULL_CTX, cfg, "flash", cfg.window_size
        )
        out_hoisted = ie.block_apply(p, x, cfg, 0, attn_impl="flash")
    finally:
        fa._fused_attention_qkv_packed = orig_packed
    out_ref = ie.block_apply(p, x, cfg, 0, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(out_hoisted), np.asarray(out_ref), atol=3e-3
    )


def test_flash_int8_out_epilogue_feeds_proj():
    """Serving int8-pre proj: the packed kernel's int8-out epilogue
    (out_inv_scale) + IntLinear's pre-quantized input path must match the
    bf16-out + standalone-quantize route to within one int8 step."""
    from sam_quantization_tpu.models import image_encoder as ie
    from sam_quantization_tpu.models.configs import VIT_TINY
    from sam_quantization_tpu.nn.packed import IntLinear, cache_int8
    from sam_quantization_tpu.quant import gptq, sequential
    import sam_quantization_tpu.ops.flash_attention as fa

    cfg = VIT_TINY.image_encoder
    key = jax.random.PRNGKey(0)
    p = ie.init_block(key, cfg, 0)
    qp = sequential.rtn_quantize_encoder(
        {"blocks": [p]}, gptq.GPTQConfig(bits=8, groupsize=0, sym=True)
    )["blocks"][0]
    scales = {"attn.qkv": 8.0, "attn.proj": 8.0, "mlp.lin1": 8.0,
              "mlp.lin2": 8.0}
    served = cache_int8(qp, act_scales=scales, skip=None)
    assert isinstance(served["attn"]["proj"], IntLinear)
    assert served["attn"]["proj"].in_scale is not None

    # bf16 input: the epilogue is gated to bf16 pipelines (the int8-pre
    # branch emits bf16, so f32 activations keep the quantize-separate path)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (2, 5, 5, cfg.embed_dim)
    ).astype(jnp.bfloat16)
    orig_packed = fa._fused_attention_qkv_packed
    seen_ois = []

    def spy(*a, **kw):
        seen_ois.append(a[2] if len(a) > 2 else kw.get("out_inv_scale"))
        return orig_packed(*a, **{**kw, "interpret": True})

    try:
        fa._fused_attention_qkv_packed = spy
        out_pre = ie.attention(served["attn"], x, cfg, attn_impl="flash")
    finally:
        fa._fused_attention_qkv_packed = orig_packed
    assert seen_ois and seen_ois[0] is not None, "epilogue did not engage"
    # reference: same weights, bf16-out + IntLinear's own static quantize
    out_ref = ie.attention(served["attn"], x, cfg, attn_impl="xla")
    # both quantize proj's input at the same static scale; the only delta is
    # rounding order (f32-round in kernel vs bf16-cast-then-round)
    d = np.abs(np.asarray(out_pre, np.float32) - np.asarray(out_ref, np.float32))
    assert d.max() < 0.15, d.max()
    a = np.asarray(out_pre, np.float32).ravel()
    b = np.asarray(out_ref, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.999


def test_flash_clamp_gate_parity(monkeypatch):
    """SAMQ_FLASH_CLAMP=0 (row-max softmax) and the default clamped softmax
    are the same normalized result up to dot/exp rounding — the static
    shift cancels in p / sum(p) for in-range logits (see _psoft note)."""
    from sam_quantization_tpu.ops import flash_attention as fa

    q, k, v, rel_h, rel_w = _mk(11, 1, 2, 1024, 64, 32, 32)
    out_clamp = flash_attention_relpos(
        q, k, v, rel_h, rel_w, 0.125, interpret=True, bias3d=True
    )
    monkeypatch.setenv("SAMQ_FLASH_CLAMP", "0")
    assert not fa._use_clamp()
    out_max = flash_attention_relpos(
        q, k, v, rel_h, rel_w, 0.125, interpret=True, bias3d=True
    )
    np.testing.assert_allclose(
        np.asarray(out_clamp), np.asarray(out_max), atol=2e-3
    )
    # windowed packed path too
    NW, nh, L, hd = 4, 2, 196, 64
    from sam_quantization_tpu.ops.flash_attention import (
        flash_attention_qkv_packed,
    )

    ks = jax.random.split(jax.random.PRNGKey(5), 2)
    qkv = jax.random.normal(ks[0], (NW, L, 3 * nh * hd), jnp.float32) * 0.5
    rel = jax.random.normal(ks[1], (NW, nh, L, 28), jnp.float32) * 0.3
    monkeypatch.delenv("SAMQ_FLASH_CLAMP", raising=False)
    a = flash_attention_qkv_packed(
        qkv, rel, hd**-0.5, nh=nh, hd=hd, kh=14, kw=14, interpret=True
    )
    monkeypatch.setenv("SAMQ_FLASH_CLAMP", "0")
    b = flash_attention_qkv_packed(
        qkv, rel, hd**-0.5, nh=nh, hd=hd, kh=14, kw=14, interpret=True
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_flash_clamp_never_nan():
    """The clamp floor guarantees sum(p) > 0 for ANY input — rows whose
    logits all sit below the floor (or above the cap) still produce finite
    output (the max-subtract form is also finite there; the claim under
    test is that replacing it with a static shift cannot divide by zero)."""
    B, nh, L, hd, kh, kw = 1, 1, 1024, 64, 32, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    # enormous negative logits: q·k ~ -4000 — far below the clamp floor
    q = -jnp.abs(jax.random.normal(ks[0], (B, nh, L, hd))) * 8.0
    k = jnp.abs(jax.random.normal(ks[1], (B, nh, L, hd))) * 8.0
    v = jax.random.normal(ks[2], (B, nh, L, hd))
    rel_h = jnp.zeros((B, nh, L, kh))
    rel_w = jnp.zeros((B, nh, L, kw))
    out = flash_attention_relpos(
        q, k, v, rel_h, rel_w, hd**-0.5, interpret=True, bias3d=True
    )
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # enormous positive logits: above the cap, squashed but finite
    out2 = flash_attention_relpos(
        -q, k, v, rel_h, rel_w, hd**-0.5, interpret=True, bias3d=True
    )
    assert np.isfinite(np.asarray(out2, np.float32)).all()


def test_flash_train_grads_match_eager():
    """flash_attention_relpos_trainable: kernel forward, eager-recompute
    vjp — gradients must be EXACTLY the eager function's (same vjp), and
    the primal must match the kernel's usual tolerance."""
    from sam_quantization_tpu.ops.flash_attention import (
        flash_attention_relpos_trainable,
    )

    q, k, v, rel_h, rel_w = _mk(17, 2, 2, 196, 64, 14, 14)
    w = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss_flash(q, k, v, rh, rw):
        o = flash_attention_relpos_trainable(
            q, k, v, rh, rw, 64**-0.5, interpret=True
        )
        return jnp.sum(o * w)

    def loss_eager(q, k, v, rh, rw):
        return jnp.sum(attention_reference(q, k, v, rh, rw, 64**-0.5) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    ge = jax.grad(loss_eager, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    for a, b in zip(gf, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # primal parity (kernel vs eager)
    np.testing.assert_allclose(
        float(loss_flash(q, k, v, rel_h, rel_w)),
        float(loss_eager(q, k, v, rel_h, rel_w)),
        rtol=2e-2,
    )
    # no-rel variant
    gf2 = jax.grad(
        lambda q, k, v: jnp.sum(
            flash_attention_relpos_trainable(
                q, k, v, None, None, 0.125, interpret=True
            )
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    ge2 = jax.grad(
        lambda q, k, v: jnp.sum(
            attention_reference(q, k, v, None, None, 0.125)
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(gf2, ge2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_scoped_jit_cpu_noop_and_passthrough(monkeypatch):
    """scoped_jit (review round-5): with SAMQ_SCOPED_VMEM_KIB set on a CPU
    backend the TPU-only compile option must NOT be passed (CPU rejects it),
    and jit kwargs must pass through. Every encoder-compiling jit routes
    through this helper so the Lp=224 gate and the raised limit stay paired."""
    from sam_quantization_tpu.ops import flash_attention as fa

    if jax.default_backend() != "cpu":  # pragma: no cover
        pytest.skip("CPU-no-op semantics only hold on a CPU backend")
    monkeypatch.setenv("SAMQ_SCOPED_VMEM_KIB", "24576")
    # CPU backend: options gate returns None (TPU-only DebugOptions field)
    assert fa.scoped_vmem_compiler_options() is None
    f = fa.scoped_jit(lambda x, n: x * n, static_argnames=("n",))
    np.testing.assert_allclose(np.asarray(f(jnp.ones((4,)), n=3)), 3.0)
    # per-block apply (the round-5 pairing fix) compiles under the env too
    from sam_quantization_tpu.models import image_encoder
    from sam_quantization_tpu.models.configs import VIT_TINY

    ecfg = VIT_TINY.image_encoder
    params = image_encoder.init(jax.random.PRNGKey(0), ecfg)
    run = image_encoder.make_per_block_apply(ecfg)
    x = jnp.zeros((1, ecfg.img_size, ecfg.img_size, 3), jnp.float32)
    out = run(params, x)
    ref = image_encoder.apply(params, x, ecfg)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-5
    )
