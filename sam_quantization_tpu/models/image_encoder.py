"""ViTDet-style SAM image encoder, functional JAX.

Capability counterpart of ``segment_anything/modeling/image_encoder.py``
(reference, GPU/torch): 16×16 conv patch embed, absolute position embedding,
``depth`` transformer blocks (windowed attention except at
``global_attn_indexes``), decomposed relative-position bias, and a two-conv
neck to 256 channels.

TPU-first design notes:
  * window partition is a parameterized reshape/transpose — the reference
    fork hard-codes ViT-H shapes (image_encoder.py:297-305, 324-328); here
    any (grid, window) pair traces.
  * everything is NHWC; the token stream is kept as (B, H, W, C) so the
    windowed/global switch is pure reshaping, which XLA folds into layouts.
  * attention can run through the fused Pallas flash-attention kernel
    (``ops/flash_attention.py``) or a plain XLA path; both consume the same
    precomputed decomposed rel-pos tiles (counterpart of
    gptq_triton/fused_attention.py:122-125).
  * apply functions are exposed per-block (``block_apply``) so the GPTQ
    sequential calibrator can stream one block at a time, like the
    reference's layer-by-layer Catcher (gptq4sam.py:311-412) but without
    exception-based control flow.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sam_quantization_tpu.models.configs import ImageEncoderConfig
from sam_quantization_tpu.nn import functional as F
from sam_quantization_tpu.quant.context import NULL_CTX


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init(key: jax.Array, cfg: ImageEncoderConfig) -> dict:
    keys = jax.random.split(key, cfg.depth + 4)
    params = {
        "patch_embed": F.init_conv2d(
            keys[0], cfg.patch_size, cfg.patch_size, cfg.in_chans, cfg.embed_dim
        ),
        "neck": {
            "conv1": F.init_conv2d(keys[1], 1, 1, cfg.embed_dim, cfg.out_chans, bias=False),
            "ln1": F.init_layer_norm(cfg.out_chans),
            "conv2": F.init_conv2d(keys[2], 3, 3, cfg.out_chans, cfg.out_chans, bias=False),
            "ln2": F.init_layer_norm(cfg.out_chans),
        },
        "blocks": [],
    }
    if cfg.use_abs_pos:
        params["pos_embed"] = jnp.zeros(
            (1, cfg.grid_size, cfg.grid_size, cfg.embed_dim), jnp.float32
        )
    for i in range(cfg.depth):
        params["blocks"].append(init_block(keys[3 + i], cfg, i))
    return params


def init_block(key: jax.Array, cfg: ImageEncoderConfig, i: int) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h, w = cfg.block_input_size(i)
    p = {
        "norm1": F.init_layer_norm(cfg.embed_dim),
        "attn": {
            "qkv": F.init_linear(k1, cfg.embed_dim, 3 * cfg.embed_dim, bias=cfg.qkv_bias),
            "proj": F.init_linear(k2, cfg.embed_dim, cfg.embed_dim),
        },
        "norm2": F.init_layer_norm(cfg.embed_dim),
        "mlp": {
            "lin1": F.init_linear(k3, cfg.embed_dim, cfg.mlp_dim),
            "lin2": F.init_linear(k4, cfg.mlp_dim, cfg.embed_dim),
        },
    }
    if cfg.use_rel_pos:
        p["attn"]["rel_pos_h"] = jnp.zeros((2 * h - 1, cfg.head_dim), jnp.float32)
        p["attn"]["rel_pos_w"] = jnp.zeros((2 * w - 1, cfg.head_dim), jnp.float32)
    return p


# ---------------------------------------------------------------------------
# Window partition (parameterized; ref image_encoder.py:282-333)
# ---------------------------------------------------------------------------


def window_partition(x: jax.Array, ws: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """(B, H, W, C) → (B * nw, ws, ws, C) with zero padding to multiples."""
    B, H, W, C = x.shape
    pad_h = (-H) % ws
    pad_w = (-W) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def window_unpartition(
    windows: jax.Array, ws: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jax.Array:
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // ((Hp // ws) * (Wp // ws))
    x = windows.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


# ---------------------------------------------------------------------------
# Decomposed relative position bias (ref image_encoder.py:336-408)
# ---------------------------------------------------------------------------


def get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Select (q_size, k_size, head_dim) rel-pos rows; linear-resize if the
    table length mismatches (ref get_rel_pos, image_encoder.py:336-360)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear"
        )
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return jnp.take(rel_pos, rel.astype(jnp.int32), axis=0)


def decomposed_rel_pos_tiles(
    q: jax.Array,
    rel_pos_h: jax.Array,
    rel_pos_w: jax.Array,
    q_size: Tuple[int, int],
    k_size: Tuple[int, int],
) -> Tuple[jax.Array, jax.Array]:
    """Precompute the two bias tiles ``rel_h (B, qh, qw, kh)`` and
    ``rel_w (B, qh, qw, kw)`` with ``q (B, qh*qw, d)``.

    The full bias is ``rel_h[..., :, None] + rel_w[..., None, :]``; both the
    XLA path and the Pallas flash kernel consume the tiles directly instead of
    materializing the (L, L) bias (same trick as the Triton kernel's two bias
    tensors, gptq_triton/fused_attention.py:122-125, 232-239).
    """
    q_h, q_w = q_size
    k_h, k_w = k_size
    Rh = get_rel_pos(q_h, k_h, rel_pos_h).astype(q.dtype)
    Rw = get_rel_pos(q_w, k_w, rel_pos_w).astype(q.dtype)
    r_q = q.reshape(q.shape[0], q_h, q_w, q.shape[-1])
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
    return rel_h, rel_w


def add_decomposed_rel_pos(
    attn: jax.Array,
    q: jax.Array,
    rel_pos_h: jax.Array,
    rel_pos_w: jax.Array,
    q_size: Tuple[int, int],
    k_size: Tuple[int, int],
) -> jax.Array:
    q_h, q_w = q_size
    k_h, k_w = k_size
    rel_h, rel_w = decomposed_rel_pos_tiles(q, rel_pos_h, rel_pos_w, q_size, k_size)
    B = attn.shape[0]
    attn = attn.reshape(B, q_h, q_w, k_h, k_w)
    attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.reshape(B, q_h * q_w, k_h * k_w)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def _packed_rel_and_flash(
    p: dict, qkv: jax.Array, nh: int, hd: int, kh: int, kw: int
) -> jax.Array:
    """Rel-pos tiles from the packed qkv activation + the packed flash call.

    Shared by :func:`attention`'s packed branch and the hoisted-windowed
    path so the kernel call convention / rel layout cannot drift between
    them. ``qkv``: (NW, kh*kw, 3*nh*hd) — the qkv linear's output, heads
    not split. Returns (NW, kh*kw, nh*hd), proj-ready.
    """
    from sam_quantization_tpu.nn.packed import IntLinear
    from sam_quantization_tpu.ops import flash_attention

    NW = qkv.shape[0]
    Rh = get_rel_pos(kh, kh, p["rel_pos_h"]).astype(qkv.dtype)
    Rw = get_rel_pos(kw, kw, p["rel_pos_w"]).astype(qkv.dtype)
    qg = qkv[:, :, : nh * hd].reshape(NW, kh, kw, nh, hd)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", qg, Rh)
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", qg, Rw)
    rel = jnp.concatenate([rel_h, rel_w], -1).reshape(NW, nh, kh * kw, kh + kw)
    # int8-pre proj: when proj serves from cached int8 weights with a static
    # activation scale, the kernel's epilogue emits int8 at that scale —
    # the standalone quantize pass between attention and proj disappears
    # (int8-pre measured 1.37x bf16 vs static's 1.16x at the ViT-H proj
    # shape, tools/microbench_a8.py round 3).
    ois = None
    proj = p.get("proj")
    if (
        isinstance(proj, IntLinear)
        and proj.in_scale is not None
        and qkv.dtype == jnp.bfloat16
    ):
        # bf16-serving only: IntLinear's int8-pre branch emits bf16, so
        # engaging the epilogue in an f32 pipeline would silently downcast
        # the attention output (quant_matmul.int8_matmul docstring).
        ois = 1.0 / proj.in_scale
    return flash_attention.flash_attention_qkv_packed(
        qkv, rel, hd**-0.5, nh=nh, hd=hd, kh=kh, kw=kw, out_inv_scale=ois
    )


def attention(
    p: dict,
    x: jax.Array,
    cfg: ImageEncoderConfig,
    ctx=NULL_CTX,
    path: str = "attn",
    attn_impl: str = "auto",
) -> jax.Array:
    """Multi-head attention over (B, H, W, C) tokens with decomposed rel-pos.

    Observation points mirror fq_vit/models/sam/image_encoder.py:446-478.
    """
    B, H, W, C = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    L = H * W
    qkv = ctx.linear(f"{path}.qkv", p["qkv"], x.reshape(B, L, C))
    qkv = ctx.act(f"{path}.qact1", qkv)

    # Sequence-parallel global attention when a mesh is active (SURVEY §5's
    # long-context mapping; opt in with parallel.sp_attention.sequence_parallel)
    sp = None
    if type(ctx) is type(NULL_CTX):
        from sam_quantization_tpu.parallel import sp_attention as sp_mod

        sp = sp_mod.active_sp(L)

    tp_active = None
    if type(ctx) is type(NULL_CTX):
        from sam_quantization_tpu.parallel import mesh as mesh_lib

        tp_active = mesh_lib.active_tp(nh)

    use_flash = tp_active is None and (
        attn_impl == "flash" or (
            attn_impl == "auto"
            and type(ctx) is type(NULL_CTX)  # FP/GPTQ only; FQ needs hooks
            and jax.default_backend() == "tpu"
        )
    )
    if (
        attn_impl == "flash_train"
        and sp is None
        and tp_active is None
        and cfg.use_rel_pos
        and L <= 512
        # Same guards as the inference flash branch: a fake-quant ctx needs
        # its qact_attn1/rel_pos_qact/softmax observation hooks (only the
        # eager path has them), and the Pallas kernels are TPU-only — a CPU
        # backend would fail inside the kernel (advisor round-4 finding).
        and type(ctx) is type(NULL_CTX)
        and jax.default_backend() == "tpu"
    ):
        # Training path: flash kernel forward + exact eager-recompute vjp
        # (ops/flash_attention.flash_attention_relpos_trainable) for the
        # windowed blocks; global (L > 512) blocks fall through to eager,
        # whose backward materializes the (nh, L, L) logits either way.
        from sam_quantization_tpu.ops import flash_attention

        qkv5 = qkv.reshape(B, L, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv5[0], qkv5[1], qkv5[2]  # (B, nh, L, hd)
        q2 = q.reshape(B * nh, L, hd)
        rel_h, rel_w = decomposed_rel_pos_tiles(
            q2, p["rel_pos_h"], p["rel_pos_w"], (H, W), (H, W)
        )
        out = flash_attention.flash_attention_relpos_trainable(
            q, k, v,
            rel_h.reshape(B, nh, L, H), rel_w.reshape(B, nh, L, W),
            hd**-0.5,
        )
        x = out.reshape(B, nh, H, W, hd).transpose(0, 2, 3, 1, 4).reshape(
            B, H, W, C
        )
        x = ctx.act(f"{path}.qact2", x)
        x = ctx.linear(f"{path}.proj", p["proj"], x)
        return ctx.act(f"{path}.qact3", x)

    if use_flash and sp is None and L <= 512 and cfg.use_rel_pos:
        # Packed-qkv windowed kernel: heads are sliced out of the projection
        # output by BlockSpec index maps and the rel-pos augmentation happens
        # in VMEM — no head transpose, no padded qa/ka/vp arrays in HBM
        # (ops/flash_attention._attn_kernel_qkv_packed).
        out = _packed_rel_and_flash(p, qkv, nh, hd, H, W)
        x = out.reshape(B, H, W, C)
        x = ctx.act(f"{path}.qact2", x)
        x = ctx.linear(f"{path}.proj", p["proj"], x)
        x = ctx.act(f"{path}.qact3", x)
        return x

    # Tensor-parallel attention: the merged (B*nh) einsum form below cannot
    # keep heads sharded under GSPMD (inner-factor sharding of a merged dim
    # is inexpressible), which makes the compiler all-gather the full qkv
    # activation per block (measured 75 MB at ViT-H windowed,
    # tools/mesh_collectives.py). Inside a parallel.mesh.tensor_parallel
    # context, run the unmerged (B, nh, L, hd) form with explicit head
    # sharding constraints so the block keeps the Megatron 2-psum schedule.
    if sp is None and tp_active is not None:
        from sam_quantization_tpu.parallel import mesh as mesh_lib

        mesh, axis, packed = tp_active
        tpn = mesh.shape[axis]
        if packed:
            # tp-major head-interleaved qkv columns (mesh_lib.tp_pack_qkv):
            # the sharded factor is MAJOR in the reshape, so head sharding
            # is expressible and no gather is emitted.
            qkv6 = qkv.reshape(B, L, tpn, 3, nh // tpn, hd)
            qkv6 = qkv6.transpose(3, 0, 2, 4, 1, 5)  # (3, B, tp, nh_t, L, hd)
            qkv6 = mesh_lib.tp_constrain(qkv6, 2, mesh, axis)
            q, k, v = qkv6[0], qkv6[1], qkv6[2]  # (B, tp, nh_t, L, hd)
        else:
            qkv5 = qkv.reshape(B, L, 3, nh, hd).transpose(2, 0, 3, 1, 4)
            # (B, 1, nh, L, hd): same einsums, no layout claim (the stock
            # [q|k|v] fused layout cannot shard head-aligned — kept as the
            # measured-negative baseline, tools/mesh_collectives --no-tp-ctx)
            q, k, v = (t[:, None] for t in (qkv5[0], qkv5[1], qkv5[2]))
        s = jnp.einsum(
            "bdnqc,bdnkc->bdnqk", q * (hd**-0.5), k,
            preferred_element_type=jnp.float32,
        )
        if cfg.use_rel_pos:
            Rh = get_rel_pos(H, H, p["rel_pos_h"]).astype(q.dtype)
            Rw = get_rel_pos(W, W, p["rel_pos_w"]).astype(q.dtype)
            qg = q.reshape(*q.shape[:3], H, W, hd)
            rel_h = jnp.einsum("bdnhwc,hkc->bdnhwk", qg, Rh)
            rel_w = jnp.einsum("bdnhwc,wkc->bdnhwk", qg, Rw)
            bias = rel_h[..., :, None] + rel_w[..., None, :]
            s = s + bias.reshape(*s.shape).astype(jnp.float32)
        attn = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        out = jnp.einsum(
            "bdnqk,bdnkc->bdnqc", attn, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)  # (B, tp|1, nh_t|nh, L, hd)
        # channel order after merging (tp, nh_t) is ascending heads — the
        # original proj input layout, so the in-sharded proj is unchanged
        out = out.transpose(0, 3, 1, 2, 4).reshape(B, H, W, C)
        out = mesh_lib.tp_constrain(out, 3, mesh, axis)  # C = heads*hd
        return ctx.linear(f"{path}.proj", p["proj"], out)

    qkv = qkv.reshape(B, L, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nh, L, hd)
    q2 = q.reshape(B * nh, L, hd)
    if sp is not None:
        mesh, axis = sp
        from sam_quantization_tpu.parallel import sp_attention as sp_mod

        rel_h = rel_w = None
        if cfg.use_rel_pos:
            rel_h, rel_w = decomposed_rel_pos_tiles(
                q2, p["rel_pos_h"], p["rel_pos_w"], (H, W), (H, W)
            )
            rel_h = rel_h.reshape(B, nh, L, H)
            rel_w = rel_w.reshape(B, nh, L, W)
        out = sp_mod.sp_attention(
            q.reshape(B, nh, L, hd),
            k.reshape(B, nh, L, hd),
            v.reshape(B, nh, L, hd),
            rel_h, rel_w, scale=hd**-0.5, mesh=mesh, axis=axis,
        )
        x = out.reshape(B, nh, H, W, hd).transpose(0, 2, 3, 1, 4).reshape(B, H, W, C)
        x = ctx.act(f"{path}.qact2", x)
        x = ctx.linear(f"{path}.proj", p["proj"], x)
        x = ctx.act(f"{path}.qact3", x)
        return x

    # Flash wins at L=4096 (4.1× over eager — logits stay in VMEM) and,
    # since the augmented-contraction rewrite (bias folded into the q·k
    # dot, multi-window batching), at window size too: measured
    # 0.63 vs 0.73 ms/block bf16 and 0.96 vs 1.52 int4 at ViT-B shapes
    # (tools/block_anatomy.py). use_flash computed above the packed branch.
    if use_flash:
        from sam_quantization_tpu.nn.packed import IntLinear
        from sam_quantization_tpu.ops import flash_attention

        rel_h, rel_w = (None, None)
        if cfg.use_rel_pos:
            rel_h, rel_w = decomposed_rel_pos_tiles(
                q2, p["rel_pos_h"], p["rel_pos_w"], (H, W), (H, W)
            )
        # int8-pre proj at the global shape too: the bias3d kernel's
        # epilogue emits proj-ready int8 (same fusion as the packed
        # windowed kernel); the head-merge transpose below then moves 1
        # byte/elem instead of 2. Fallback dispatch paths ignore the scale
        # and return bf16 — IntLinear accepts both.
        ois = None
        proj = p.get("proj")
        if (
            isinstance(proj, IntLinear)
            and proj.in_scale is not None
            and x.dtype == jnp.bfloat16  # bf16-serving only (see above)
        ):
            ois = 1.0 / proj.in_scale
        out = flash_attention.flash_attention_relpos(
            q.reshape(B, nh, L, hd),
            k.reshape(B, nh, L, hd),
            v.reshape(B, nh, L, hd),
            rel_h.reshape(B, nh, L, H) if rel_h is not None else None,
            rel_w.reshape(B, nh, L, W) if rel_w is not None else None,
            scale=hd**-0.5,
            out_inv_scale=ois,
        )
        x = out.reshape(B, nh, H, W, hd).transpose(0, 2, 3, 1, 4).reshape(B, H, W, C)
    else:
        k2 = k.reshape(B * nh, L, hd)
        v2 = v.reshape(B * nh, L, hd)
        attn = jnp.einsum(
            "bqc,bkc->bqk", q2 * (hd**-0.5), k2, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        attn = ctx.act(f"{path}.qact_attn1", attn)
        scale_path = f"{path}.qact_attn1"
        if cfg.use_rel_pos:
            attn = add_decomposed_rel_pos(
                attn, q2, p["rel_pos_h"], p["rel_pos_w"], (H, W), (H, W)
            )
            attn = ctx.act(f"{path}.rel_pos_qact", attn)
            scale_path = f"{path}.rel_pos_qact"
        attn = ctx.softmax(f"{path}.softmax", attn, scale_path=scale_path)
        out = jnp.einsum("bqk,bkc->bqc", attn, v2, preferred_element_type=jnp.float32)
        out = out.astype(x.dtype)
        x = out.reshape(B, nh, H, W, hd).transpose(0, 2, 3, 1, 4).reshape(B, H, W, C)
    x = ctx.act(f"{path}.qact2", x)
    x = ctx.linear(f"{path}.proj", p["proj"], x)
    x = ctx.act(f"{path}.qact3", x)
    return x


def _attention_windowed_hoisted(
    p: dict, x: jax.Array, cfg: ImageEncoderConfig, ws: int, ctx, path: str
) -> jax.Array:
    """Windowed attention with proj BELOW the window unpartition: proj is
    per-token, so running it after the unpartition's pad-slice is the same
    math on the real H*W tokens instead of the zero-padded (Hp, Wp) grid
    (ViT-H: 4096 vs 4900 tokens — 16% of the proj FLOPs were padding; the
    reference projects on the padded grid, image_encoder.py:189-207 +
    282-307) AND strictly less data movement (the unpartition transpose
    happens either way; this orders it before the matmul).

    ``SAMQ_HOIST_QKV=1`` additionally hoists the qkv matmul ABOVE the
    partition (bias re-added after it, so padded slots hold exactly
    ``bias`` == linear(0) — numerics identical). Measured on v5e ViT-H,
    that trade LOSES: partitioning the 3C-wide qkv output costs more HBM
    traffic than the 16% matmul FLOPs it saves (windowed stage 33.7 →
    35.5 ms int8-serving), so it defaults off. Kept as the measured
    negative result + the knob to re-test on other toolchains/shapes.
    """
    import dataclasses as _dc

    B, H, W, C = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    NW, L = -1, ws * ws
    if os.environ.get("SAMQ_HOIST_QKV") == "1":
        qp = p["qkv"]
        if isinstance(qp, dict):
            bias, nobias = qp.get("b"), {"w": qp["w"]}
        else:
            bias, nobias = qp.bias, _dc.replace(qp, bias=None)
        qkv = ctx.linear(f"{path}.qkv", nobias, x.reshape(B, H * W, C))
        qkv, pad_hw = window_partition(qkv.reshape(B, H, W, 3 * C), ws)
        if bias is not None:
            qkv = qkv + bias.astype(qkv.dtype)
    else:
        xw, pad_hw = window_partition(x, ws)
        qkv = ctx.linear(
            f"{path}.qkv", p["qkv"], xw.reshape(-1, L, C)
        )
    NW = qkv.shape[0]
    qkv = qkv.reshape(NW, L, 3 * C)
    out = _packed_rel_and_flash(p, qkv, nh, hd, ws, ws)
    out = window_unpartition(out.reshape(NW, ws, ws, C), ws, pad_hw, (H, W))
    return ctx.linear(f"{path}.proj", p["proj"], out)


def _use_hoisted_windowed(ctx, cfg, attn_impl: str, ws: int) -> bool:
    """Hoist-experiment gate (``SAMQ_HOIST_PROJ=1``; default OFF).

    Moving proj below the unpartition (and, with ``SAMQ_HOIST_QKV=1``, qkv
    above the partition) trades 16% of the qkv/proj matmul FLOPs (real
    4096 tokens vs the zero-padded 4900 grid at ViT-H) against XLA's
    fusion/layout choices around the partition transposes. Measured on a
    v5e with same-run global-stage drift normalization (BENCHMARKS.md):
    the int8-serving windowed stage is FASTEST with the original
    partition-first order (3.99-4.01 win/glob ratio vs 4.12 qkv+proj /
    4.25 proj-only) — the wider-tensor partition traffic and lost fusions
    outweigh the padding FLOPs. Defaults off; the gate (and the parity
    test) keep the experiment reproducible on other toolchains.

    Beyond the env gate this mirrors the packed-qkv flash branch in
    :func:`attention` (NullCtx only — the FQ ctx needs its per-point hooks
    on the partitioned stream — rel-pos windowed shapes, TPU or forced)."""
    if ws <= 0 or not cfg.use_rel_pos or ws * ws > 512:
        return False
    if os.environ.get("SAMQ_HOIST_PROJ") != "1":
        return False
    if type(ctx) is not type(NULL_CTX):
        return False
    if not (
        attn_impl == "flash"
        or (attn_impl == "auto" and jax.default_backend() == "tpu")
    ):
        return False
    from sam_quantization_tpu.parallel import sp_attention as sp_mod

    return sp_mod.active_sp(ws * ws) is None


# ---------------------------------------------------------------------------
# Block / encoder
# ---------------------------------------------------------------------------


def block_apply(
    p: dict,
    x: jax.Array,
    cfg: ImageEncoderConfig,
    block_idx: int,
    ctx=NULL_CTX,
    path: Optional[str] = None,
    attn_impl: str = "auto",
) -> jax.Array:
    """One transformer block on (B, H, W, C) (ref Block.forward,
    image_encoder.py:189-207; observation points fq_vit image_encoder.py:313-331)."""
    path = path or f"blocks.{block_idx}"
    ws = cfg.block_window(block_idx)
    in_path = f"blocks.{block_idx - 1}.qact4" if block_idx > 0 else "qact_embed"
    shortcut = x
    x = ctx.layer_norm(
        f"{path}.norm1", p["norm1"], x, cfg.ln_eps,
        in_path=in_path, out_path=f"{path}.qact1",
    )
    x = ctx.act(f"{path}.qact1", x)
    H, W = x.shape[1], x.shape[2]
    if ws > 0 and _use_hoisted_windowed(ctx, cfg, attn_impl, ws):
        x = _attention_windowed_hoisted(
            p["attn"], x, cfg, ws, ctx, f"{path}.attn"
        )
    else:
        if ws > 0:
            x, pad_hw = window_partition(x, ws)
        x = attention(p["attn"], x, cfg, ctx, f"{path}.attn", attn_impl)
        if ws > 0:
            x = window_unpartition(x, ws, pad_hw, (H, W))
    x = ctx.act(f"{path}.qact2", shortcut + x, ln_input=True)
    h = ctx.layer_norm(
        f"{path}.norm2", p["norm2"], x, cfg.ln_eps,
        in_path=f"{path}.qact2", out_path=f"{path}.qact3",
    )
    h = ctx.act(f"{path}.qact3", h)
    lin1, lin2 = p["mlp"]["lin1"], p["mlp"]["lin2"]
    if _use_fused_mlp(ctx, lin1, lin2, attn_impl):
        from sam_quantization_tpu.ops import fused_mlp as fused_mlp_ops

        h = fused_mlp_ops.fused_mlp(h, lin1, lin2)
    else:
        h = ctx.linear(f"{path}.mlp.lin1", lin1, h)
        h = F.gelu(h)
        h = ctx.act(f"{path}.mlp.qact1", h)
        h = ctx.linear(f"{path}.mlp.lin2", lin2, h)
        h = ctx.act(f"{path}.mlp.qact2", h)
    x = ctx.act(f"{path}.qact4", x + h, ln_input=True)
    return x


def _use_fused_mlp(ctx, lin1, lin2, attn_impl) -> bool:
    """Fused quantized MLP: NullCtx (FP/GPTQ) inference on TPU with both
    linears packed (the FQ ctx needs its per-point hooks)."""
    if type(ctx) is not type(NULL_CTX) or attn_impl == "xla":
        return False
    from sam_quantization_tpu.ops import fused_mlp as fused_mlp_ops

    return fused_mlp_ops.fused_mlp_supported(lin1, lin2) and (
        jax.default_backend() == "tpu"
    )


def embed(p: dict, x: jax.Array, cfg: ImageEncoderConfig, ctx=NULL_CTX) -> jax.Array:
    """Patch embed + abs pos embed. x: (B, H, W, 3) NHWC image → (B, h, w, C)."""
    x = ctx.conv2d(
        "patch_embed", p["patch_embed"], x, stride=cfg.patch_size, padding=0
    )
    if cfg.use_abs_pos:
        x = x + p["pos_embed"].astype(x.dtype)
    x = ctx.act("qact_embed", x, ln_input=True)
    return x


def neck(p: dict, x: jax.Array, cfg: ImageEncoderConfig, ctx=NULL_CTX) -> jax.Array:
    """1×1 conv → LN2d → 3×3 conv → LN2d (ref image_encoder.py:88-104).
    NHWC in, NHWC out (channels-last; callers convert if they need NCHW).

    Both LN2ds route through ``ctx.layer_norm`` with in/out observation
    points, so FQ can run them as integer LayerNorms — the counterpart of
    the reference's ``QIntLayerNorm2D`` (fq_vit/models/sam/common.py:91-148),
    which that fork ships short-circuited to FP. In NHWC the channel LN is
    just a last-axis LN, so the same int-LN kernel serves 1D and 2D."""
    x = ctx.conv2d("neck.conv1", p["neck"]["conv1"], x, stride=1, padding=0)
    x = ctx.act("neck.qact_ln1_in", x, ln_input=True)
    x = ctx.layer_norm(
        "neck.ln1", p["neck"]["ln1"], x, cfg.ln_eps,
        in_path="neck.qact_ln1_in", out_path="neck.qact1",
    )
    x = ctx.act("neck.qact1", x)
    x = ctx.conv2d("neck.conv2", p["neck"]["conv2"], x, stride=1, padding=1)
    x = ctx.act("neck.qact_ln2_in", x, ln_input=True)
    x = ctx.layer_norm(
        "neck.ln2", p["neck"]["ln2"], x, cfg.ln_eps,
        in_path="neck.qact_ln2_in", out_path="neck.qact2",
    )
    x = ctx.act("neck.qact2", x)
    return x


def apply(
    p: dict,
    x: jax.Array,
    cfg: ImageEncoderConfig,
    ctx=NULL_CTX,
    attn_impl: str = "auto",
    scan_blocks: str = "auto",
) -> jax.Array:
    """Full encoder: (B, H, W, 3) image → (B, h, w, out_chans) embedding.

    ``scan_blocks``: "auto" | "on" | "off". When the depth decomposes into
    identical (windowed×k, global) super-blocks — true for ViT-B/L/H — the
    block stack runs as a ``lax.scan`` over stacked parameters, shrinking the
    traced program by the super-block count (compile time and HLO size drop
    ~4×). Only for hook-free contexts (the FQ ctx needs per-block paths).
    """
    x = embed(p, x, cfg, ctx)
    period = _superblock_period(cfg)
    use_scan = scan_blocks == "on" or (
        scan_blocks == "auto"
        and period is not None
        and type(ctx) is type(NULL_CTX)
        and cfg.depth // period >= 2
        and _blocks_homogeneous(p["blocks"], period)
    )
    if use_scan:
        x = _apply_blocks_scanned(p, x, cfg, period, attn_impl)
    else:
        for i in range(cfg.depth):
            x = block_apply(p["blocks"][i], x, cfg, i, ctx, attn_impl=attn_impl)
    return neck(p, x, cfg, ctx)


def make_per_block_apply(cfg: ImageEncoderConfig, attn_impl: str = "auto"):
    """Encoder apply as small per-stage jits driven by a host loop.

    For environments where a whole-encoder compile is infeasible (the axon
    remote-compile helper fails on ViT-L/H-sized programs), this compiles
    embed, one windowed block, one global block, and the neck as four small
    programs and loops on host. Costs one dispatch per block; numerics are
    identical to :func:`apply`.
    """
    # scoped_jit: the packed flash kernel's Lp=224 gate reads
    # SAMQ_SCOPED_VMEM_KIB, so these block jits must compile under the
    # matching raised scoped-vmem limit (a bare jax.jit would hit the
    # round-4 ViT-L compile failure when the env is set).
    from sam_quantization_tpu.ops.flash_attention import scoped_jit

    embed_fn = scoped_jit(lambda p, x: embed(p, x, cfg))
    neck_fn = scoped_jit(lambda p, x: neck(p, x, cfg))
    block_fns = {}

    def block_fn(i: int):
        ws = cfg.block_window(i)
        if ws not in block_fns:
            slot = i  # any block index with this window size traces the same
            block_fns[ws] = scoped_jit(
                lambda bp, x, slot=slot: block_apply(
                    bp, x, cfg, slot, NULL_CTX, attn_impl=attn_impl
                )
            )
        return block_fns[ws]

    def run(p, x):
        x = embed_fn(p, x)
        for i in range(cfg.depth):
            x = block_fn(i)(p["blocks"][i], x)
        return neck_fn(p, x)

    return run


def _superblock_period(cfg: ImageEncoderConfig):
    """Period p such that blocks [i*p .. (i+1)*p) have identical window
    structure across i (global exactly at the last slot), else None."""
    g = sorted(cfg.global_attn_indexes)
    if not g or cfg.depth % len(g) != 0:
        return None
    period = cfg.depth // len(g)
    if all(gi == (k + 1) * period - 1 for k, gi in enumerate(g)):
        return period
    return None


def _blocks_homogeneous(blocks, period: int) -> bool:
    """Scanned stacking needs every same-slot block to share one pytree
    structure (incl. static metadata like PackedLinear bits). Mixed-precision
    overrides break this — those models run the unrolled loop instead."""
    ref_win = jax.tree_util.tree_structure(blocks[0])
    ref_glob = jax.tree_util.tree_structure(blocks[period - 1])
    for i, blk in enumerate(blocks):
        ref = ref_glob if (i + 1) % period == 0 else ref_win
        if jax.tree_util.tree_structure(blk) != ref:
            return False
    return True


def _apply_blocks_scanned(p, x, cfg, period, attn_impl):
    """Two-level scan: outer over super-blocks, inner over the (identical)
    windowed slots — the traced body is ONE windowed + ONE global block
    regardless of depth (ViT-H: 32 blocks → 2-block HLO)."""
    n_super = cfg.depth // period

    def stack(trees):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)

    # (n_super, period-1, ...) windowed params; (n_super, ...) global params.
    windowed = stack(
        [
            stack([p["blocks"][i * period + j] for j in range(period - 1)])
            for i in range(n_super)
        ]
    )
    global_blocks = stack([p["blocks"][(i + 1) * period - 1] for i in range(n_super)])

    def super_step(x, trees):
        win_tree, glob_tree = trees

        def win_step(x, blk):
            x = block_apply(blk, x, cfg, 0, NULL_CTX, attn_impl=attn_impl)
            return x, None

        x, _ = jax.lax.scan(win_step, x, win_tree)
        x = block_apply(glob_tree, x, cfg, period - 1, NULL_CTX, attn_impl=attn_impl)
        return x, None

    x, _ = jax.lax.scan(super_step, x, (windowed, global_blocks))
    return x
