"""Fused attention with decomposed relative-position bias (Pallas TPU).

Counterpart of the reference's Triton flash-attention kernel
(gptq_triton/fused_attention.py:159-309), which streams K/V with an online
softmax and indexes two precomputed bias tensors as ``rel_h[m, n // W]`` +
``rel_w[m, n % W]`` per element.

TPU-first redesign: SAM's sequence lengths are structurally bounded (196
tokens per 14×14 window, 4096 for the four global blocks — see
build_sam.py:78), so the whole K/V block fits in VMEM and a **row-block**
formulation is optimal: each program computes a full (BQ, L) logit tile,
adds the decomposed bias via a broadcast-reshape (no per-element ``//``/``%``
gathers — the (kh, kw) factorization is a plain reshape of the key axis),
does one exact softmax, and hits the MXU twice. No online-softmax state, no
rescaling passes, identical math.

Shapes are padded to (sublane × lane) tiles: head_dim → 128 lanes with zero
fill (contributes nothing to logits), key length → 128-multiples masked with
-inf before softmax.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *, scale, L, kh, kw):
    """One (BQ, L) row block of attention for one (batch*head).

    q_ref: (1, BQ, Dp); k_ref/v_ref: (1, Lp, Dp); rh_ref: (1, BQ, KHp);
    rw_ref: (1, BQ, KWp); o_ref: (1, BQ, Dp).
    """
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, Lp)
    s = s * scale
    BQ, Lp = s.shape
    # Decomposed rel-pos bias: bias[m, n] = rel_h[m, n // kw] + rel_w[m, n % kw].
    # Expressed as two one-hot selector matmuls (MXU work, no lane shuffles):
    #   bias = rel_h @ Eh + rel_w @ Ew,  Eh[i, n] = [n // kw == i],
    #                                    Ew[j, n] = [n %  kw == j]
    # — the TPU-native form of the Triton kernel's per-element indexing
    # (fused_attention.py:232-239). Padded key columns get -inf.
    rh = rh_ref[0].astype(jnp.float32)  # (BQ, KHp)
    rw = rw_ref[0].astype(jnp.float32)  # (BQ, KWp)
    khp, kwp = rh.shape[1], rw.shape[1]
    ids_n_h = jax.lax.broadcasted_iota(jnp.int32, (khp, Lp), 1)
    ids_k_h = jax.lax.broadcasted_iota(jnp.int32, (khp, Lp), 0)
    eh = ((ids_n_h // kw == ids_k_h) & (ids_n_h < L)).astype(jnp.float32)
    ids_n_w = jax.lax.broadcasted_iota(jnp.int32, (kwp, Lp), 1)
    ids_k_w = jax.lax.broadcasted_iota(jnp.int32, (kwp, Lp), 0)
    ew = ((ids_n_w % kw == ids_k_w) & (ids_n_w < L)).astype(jnp.float32)
    bias = jnp.dot(rh, eh, preferred_element_type=jnp.float32) + jnp.dot(
        rw, ew, preferred_element_type=jnp.float32
    )
    if Lp > L:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
        bias = bias + jnp.where(col < L, 0.0, NEG_INF)
    s = s + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v_ref.dtype)
    o_ref[0] = jnp.dot(p, v_ref[0], preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "kh", "kw", "L", "block_q", "interpret")
)
def _fused_attention(q, k, v, rel_h, rel_w, *, scale, kh, kw, L, block_q, interpret):
    BH, Lqp, Dp = q.shape
    grid = (BH, Lqp // block_q)
    flops = 4 * BH * L * L * Dp
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, L=L, kh=kh, kw=kw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, k.shape[1], Dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, k.shape[1], Dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, rel_h.shape[2]), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, rel_w.shape[2]), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Lqp, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * BH * L * Dp * q.dtype.itemsize,
            transcendentals=BH * L * L,
        ),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w)


def flash_attention_relpos(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_h: Optional[jax.Array],
    rel_w: Optional[jax.Array],
    scale: float,
    *,
    kv_size: Optional[Tuple[int, int]] = None,
    interpret: bool = False,
) -> jax.Array:
    """Self-attention with decomposed rel-pos bias.

    Args:
      q, k, v: (B, nh, L, hd).
      rel_h: (B, nh, L, kh) bias tile (``q @ Rh^T``) or None.
      rel_w: (B, nh, L, kw) bias tile or None.
      scale: softmax scale applied to logits.
      kv_size: (kh, kw) with kh * kw == L; inferred from rel tiles if given.

    Returns (B, nh, L, hd).
    """
    B, nh, L, hd = q.shape
    if rel_h is not None:
        kh, kw = rel_h.shape[-1], rel_w.shape[-1]
    elif kv_size is not None:
        kh, kw = kv_size
    else:
        kh, kw = 1, L
    assert kh * kw == L, (kh, kw, L)

    BH = B * nh
    Dp = _round_up(hd, 128)
    Lp = _round_up(L, 128)
    block_q = min(Lp, 256 if L > 1024 else Lp)

    def prep(x):
        x = x.reshape(BH, L, hd)
        return jnp.pad(x, ((0, 0), (0, Lp - L), (0, Dp - hd)))

    qp, kp, vp = prep(q), prep(k), prep(v)
    if rel_h is None:
        rel_h = jnp.zeros((BH, Lp, 128), q.dtype)
        rel_w = jnp.zeros((BH, Lp, _round_up(kw, 128)), q.dtype)
    else:
        rel_h = jnp.pad(
            rel_h.reshape(BH, L, kh),
            ((0, 0), (0, Lp - L), (0, _round_up(kh, 128) - kh)),
        )
        rel_w = jnp.pad(
            rel_w.reshape(BH, L, kw),
            ((0, 0), (0, Lp - L), (0, _round_up(kw, 128) - kw)),
        )

    out = _fused_attention(
        qp, kp, vp, rel_h, rel_w,
        scale=scale, kh=kh, kw=kw, L=L, block_q=block_q, interpret=interpret,
    )
    return out[:, :L, :hd].reshape(B, nh, L, hd)


def attention_reference(q, k, v, rel_h, rel_w, scale):
    """Eager reference for parity tests (pattern of the reference's own
    kernel self-test, gptq_triton/fused_attention.py:363-418)."""
    B, nh, L, hd = q.shape
    s = jnp.einsum("bnqc,bnkc->bnqk", q * scale, k).astype(jnp.float32)
    if rel_h is not None:
        kh, kw = rel_h.shape[-1], rel_w.shape[-1]
        bias = rel_h[..., :, None] + rel_w[..., None, :]
        s = s + bias.reshape(B, nh, L, L).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bnqk,bnkc->bnqc", p, v)
