"""GPTQ weight-only quantization solver, formulated for XLA.

Capability counterpart of the reference's ``gptq.py`` (itself from
IST-DASLab/gptq): per-layer Hessian accumulation ``H = (2/B) Σ x xᵀ``, damped
Cholesky inverse, block-wise column-by-column quantization with error
feedback, optional activation ordering (``actorder``) and per-group
scale/zero.

XLA-first reformulation (the reference's Python column loop, gptq.py:101-142,
is a host-side loop over GPU ops):
  * the whole solver is one jit-compiled function; the column loop is a
    ``lax.fori_loop`` whose body does rank-1 masked updates on a fixed-shape
    (N, blocksize) tile — no dynamic slicing inside the inner loop;
  * block boundaries align with scale groups, so group parameters are
    computed once per block from the error-fed weights (same semantics as
    gptq.py:113-118 when ``groupsize % blocksize == 0``);
  * the Cholesky chain ``chol(inv(chol-form H))`` reproduces the reference's
    ``cholesky → cholesky_inverse → cholesky(upper)`` exactly (upper factor
    of H⁻¹ = Lᵀ of its lower factor).

Weight orientation: the solver works on W as (rows=N out, cols=K in) like the
reference; callers pass our (K, N) weights transposed.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GPTQConfig:
    bits: int = 4
    groupsize: int = -1  # -1 = one group over all of K
    sym: bool = False
    actorder: bool = False
    percdamp: float = 0.01
    blocksize: int = 128
    mse: bool = False  # grid-shrink scale search (reference Quantizer mse path)
    maxshrink: float = 0.8
    grid: int = 100
    norm: float = 2.4

    @property
    def maxq(self) -> int:
        return (1 << self.bits) - 1


class GPTQResult(NamedTuple):
    q_int: jax.Array  # (N, K) integer grid values
    scales: jax.Array  # (N, G)
    zeros: jax.Array  # (N, G)
    loss: jax.Array  # scalar Σ losses (reference's `error`, gptq.py:153)
    g_idx: jax.Array  # (K,) group index of each (original-order) column; with
    #   actorder groups follow the permuted order, so this is NOT arange(K)//g


def find_params(
    w: jax.Array, maxq: int, sym: bool, mse: bool = False,
    maxshrink: float = 0.8, grid: int = 100, norm: float = 2.4,
) -> Tuple[jax.Array, jax.Array]:
    """Per-row min-max (optionally MSE-shrunk) quantization grid for (N, k)
    weights (reference Quantizer.find_params, gptq.py:213-296)."""
    wmin = jnp.minimum(w.min(axis=1), 0.0)
    wmax = jnp.maximum(w.max(axis=1), 0.0)
    if sym:
        wmax = jnp.maximum(jnp.abs(wmin), wmax)
        wmin = jnp.where(wmin < 0, -wmax, wmin)
    degenerate = (wmin == 0) & (wmax == 0)
    wmin = jnp.where(degenerate, -1.0, wmin)
    wmax = jnp.where(degenerate, 1.0, wmax)
    scale = (wmax - wmin) / maxq
    zero = jnp.full_like(scale, (maxq + 1) / 2) if sym else jnp.round(-wmin / scale)

    if mse:
        def candidate(i):
            p = 1 - i / grid * maxshrink
            s = p * (wmax - wmin) / maxq
            z = zero if sym else jnp.round(-p * wmin / s)
            q = jnp.clip(jnp.round(w / s[:, None]) + z[:, None], 0, maxq)
            dq = s[:, None] * (q - z[:, None])
            err = (jnp.abs(dq - w) ** norm).sum(axis=1)
            return err, s, z

        errs, ss, zs = jax.vmap(candidate)(jnp.arange(grid))
        best = jnp.argmin(errs, axis=0)
        r = jnp.arange(w.shape[0])
        scale, zero = ss[best, r], zs[best, r]
    return scale, zero


def _prepare_hinv(h: jax.Array, percdamp: float) -> jax.Array:
    """damp → cholesky-inverse → upper factor (reference gptq.py:89-97)."""
    K = h.shape[0]
    dead = jnp.diag(h) == 0
    h = h + jnp.diag(jnp.where(dead, 1.0, 0.0))
    damp = percdamp * jnp.mean(jnp.diag(h))
    h = h + damp * jnp.eye(K, dtype=h.dtype)
    hinv = jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(h), True), jnp.eye(K, dtype=h.dtype)
    )
    lower = jnp.linalg.cholesky(hinv)
    return lower.T  # upper U with UᵀU = H⁻¹, identical to torch's upper chol


@functools.partial(
    jax.jit, static_argnames=("bits", "groupsize", "sym", "actorder", "percdamp",
                              "blocksize", "mse"),
)
def gptq_quantize_matrix(
    w: jax.Array,
    h: jax.Array,
    *,
    bits: int,
    groupsize: int = -1,
    sym: bool = False,
    actorder: bool = False,
    percdamp: float = 0.01,
    blocksize: int = 128,
    mse: bool = False,
) -> GPTQResult:
    """Quantize W (N, K) given Hessian H (K, K) (reference fasterquant,
    gptq.py:62-171)."""
    N, K = w.shape
    maxq = (1 << bits) - 1
    w = w.astype(jnp.float32)
    h = h.astype(jnp.float32)

    dead = jnp.diag(h) == 0
    w = jnp.where(dead[None, :], 0.0, w)

    if actorder:
        perm = jnp.argsort(-jnp.diag(h))
        w = w[:, perm]
        h = h[perm][:, perm]
        invperm = jnp.argsort(perm)

    hinv = _prepare_hinv(h, percdamp)

    g = groupsize if groupsize > 0 else K
    # tiny layers: a group never exceeds the K axis (same clamp as
    # nn/packed.quantize_rtn — a 64-wide vit_tiny layer at --groupsize 128
    # otherwise hits a dynamic_slice shape error mid-solve)
    g = min(g, K)
    bs = min(blocksize, g, K)
    assert K % bs == 0 and g % bs == 0, (K, g, bs)
    num_blocks = K // bs
    blocks_per_group = g // bs
    G = K // g

    full_scale, full_zero = (None, None)
    if G == 1:
        full_scale, full_zero = find_params(w, maxq, sym, mse)

    def block_step(carry, bidx):
        w, total_loss, cur_scale, cur_zero = carry
        i1 = bidx * bs
        w1 = jax.lax.dynamic_slice(w, (0, i1), (N, bs))
        hinv_rows = jax.lax.dynamic_slice(hinv, (i1, 0), (bs, K))
        hinv1 = jax.lax.dynamic_slice(hinv_rows, (0, i1), (bs, bs))

        if G == 1:
            scale, zero = full_scale, full_zero
        else:
            # Group params are found once per group, at its first block, from
            # the *current* error-fed weights (gptq.py:113-118); later blocks
            # of the same group reuse them via the scan carry.
            def fresh():
                wg = jax.lax.dynamic_slice(w, (0, i1), (N, g))
                return find_params(wg, maxq, sym, mse)

            scale, zero = jax.lax.cond(
                bidx % blocks_per_group == 0, fresh, lambda: (cur_scale, cur_zero)
            )

        col_ids = jnp.arange(bs)

        def col_step(j, state):
            w1, q1, err1 = state
            col = jax.lax.dynamic_index_in_dim(w1, j, axis=1, keepdims=False)
            d = hinv1[j, j]
            q = jnp.clip(jnp.round(col / scale) + zero, 0, maxq)
            dq = scale * (q - zero)
            err = (col - dq) / d
            # error feedback onto columns > j of this block
            mask = (col_ids > j).astype(w1.dtype)
            w1 = w1 - err[:, None] * (hinv1[j][None, :] * mask[None, :])
            q1 = jnp.where(col_ids[None, :] == j, q[:, None], q1)
            err1 = jnp.where(col_ids[None, :] == j, err[:, None], err1)
            return w1, q1, err1

        w1f, q1, err1 = jax.lax.fori_loop(
            0, bs, col_step, (w1, jnp.zeros_like(w1), jnp.zeros_like(w1))
        )

        # propagate error to all later columns (gptq.py:146)
        later = (jnp.arange(K) >= i1 + bs).astype(w.dtype)
        w = w - (err1 @ hinv_rows) * later[None, :]
        # store quantized block back (as int grid) via dq placeholder slot
        w = jax.lax.dynamic_update_slice(w, scale[:, None] * (q1 - zero[:, None]), (0, i1))

        # Σ (w - dq)² / d² / 2 with err = (w - dq)/d  (gptq.py:134, 145)
        loss = (err1**2).sum() / 2
        return (w, total_loss + loss, scale, zero), (q1, scale, zero)

    if G == 1:
        scale0, zero0 = full_scale, full_zero
    else:
        scale0 = jnp.zeros((N,), jnp.float32)
        zero0 = jnp.zeros((N,), jnp.float32)
    (wq, total_loss, _, _), (q_blocks, scales_b, zeros_b) = jax.lax.scan(
        block_step, (w, jnp.float32(0.0), scale0, zero0), jnp.arange(num_blocks)
    )
    # q_blocks: (num_blocks, N, bs) → (N, K)
    q_int = jnp.moveaxis(q_blocks, 0, 1).reshape(N, K)
    # scales per block → per group (first block of each group carries them)
    scales = jnp.moveaxis(scales_b, 0, 1)[:, ::blocks_per_group]  # (N, G)
    zeros = jnp.moveaxis(zeros_b, 0, 1)[:, ::blocks_per_group]

    g_idx = jnp.arange(K, dtype=jnp.int32) // g
    if actorder:
        q_int = q_int[:, invperm]
        # Groups were formed in the *permuted* column order (the reference
        # dequantizes in the permuted domain before invperm, gptq.py:127-141):
        # original column k sat at permuted position invperm[k], so its group
        # is invperm[k] // g. Consumers must gather scales/zeros via g_idx.
        g_idx = (invperm // g).astype(jnp.int32)

    return GPTQResult(
        q_int=q_int.astype(jnp.int32), scales=scales, zeros=zeros,
        loss=total_loss, g_idx=g_idx,
    )


def reconstruct(res: GPTQResult, groupsize: int, K: int) -> jax.Array:
    """Dequantized (N, K) weights from a solver result (group params gathered
    per column via g_idx, so actorder+groupsize layouts dequantize correctly)."""
    q = res.q_int.astype(jnp.float32)
    scales = res.scales[:, res.g_idx]  # (N, K)
    zeros = res.zeros[:, res.g_idx]
    return (q - zeros) * scales
