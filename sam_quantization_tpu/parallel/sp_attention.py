"""Sequence-parallel global attention over a mesh axis.

SURVEY §5's long-context mapping: SAM's windowed blocks are embarrassingly
parallel (windows shard like batch), and the four 4096-token *global* blocks
are where sequence parallelism applies when scaling image resolution. This
module shards the query sequence over a mesh axis and all-gathers K/V over
ICI (the all-gather overlaps with the first query tile's compute under XLA's
latency-hiding scheduler) — the Ulysses/ring-attention seam, expressed with
``shard_map`` + ``jax.lax.all_gather`` collectives instead of NCCL.

Decomposed rel-pos bias: the per-query tiles ``rel_h``/``rel_w`` shard with
the queries (they are functions of q only), exactly as the reference
precomputes them per tile (gptq_triton/fused_attention.py:122-125).
"""

from __future__ import annotations

import contextlib
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
try:  # moved out of experimental in jax 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

# ---------------------------------------------------------------------------
# Active-mesh context: the encoder's production call site. The model code
# (models/image_encoder.attention) consults this instead of taking a mesh
# argument, so the same apply() serves single-chip and sequence-parallel
# execution — ``with sequence_parallel(mesh): encoder.apply(...)``.
# ---------------------------------------------------------------------------

_ACTIVE: List[Tuple[Mesh, str, int]] = []


@contextlib.contextmanager
def sequence_parallel(mesh: Mesh, axis: str = "tp", min_len: int = 1024):
    """Route global-attention blocks through :func:`sp_attention` inside the
    with-body. ``min_len``: only sequences at least this long shard (the
    windowed blocks' tiny L would pay collective latency for nothing)."""
    _ACTIVE.append((mesh, axis, min_len))
    try:
        yield
    finally:
        _ACTIVE.pop()


def active_sp(seq_len: int) -> Optional[Tuple[Mesh, str]]:
    """The (mesh, axis) to use for a global-attention call, or None."""
    if not _ACTIVE:
        return None
    mesh, axis, min_len = _ACTIVE[-1]
    if seq_len < min_len or seq_len % mesh.shape[axis] != 0:
        return None
    return mesh, axis


def sp_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_h: Optional[jax.Array],
    rel_w: Optional[jax.Array],
    scale: float,
    mesh: Mesh,
    axis: str = "tp",
) -> jax.Array:
    """Global self-attention with the L axis sharded over ``axis``.

    q/k/v: (B, nh, L, hd); rel_h: (B, nh, L, kh); rel_w: (B, nh, L, kw).
    Each shard holds L/n queries (and its K/V slice); K/V are all-gathered
    inside the shard_map body.
    """
    B, nh, L, hd = q.shape
    kh = rel_h.shape[-1] if rel_h is not None else 1
    kw = rel_w.shape[-1] if rel_w is not None else L

    spec_l = P(None, None, axis, None)
    has_rel = rel_h is not None

    def body(q_l, k_l, v_l, rh_l, rw_l):
        k_full = jax.lax.all_gather(k_l, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_l, axis, axis=2, tiled=True)
        s = jnp.einsum(
            "bnqc,bnkc->bnqk", q_l * scale, k_full,
            preferred_element_type=jnp.float32,
        )
        if has_rel:
            bias = rh_l[..., :, None] + rw_l[..., None, :]  # (B, nh, Lq, kh, kw)
            s = s + bias.reshape(*s.shape).astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(q_l.dtype)
        return jnp.einsum(
            "bnqk,bnkc->bnqc", p, v_full, preferred_element_type=jnp.float32
        ).astype(q_l.dtype)

    try:  # jax>=0.8 renamed check_rep -> check_vma
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(spec_l, spec_l, spec_l, spec_l, spec_l),
            out_specs=spec_l, check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(spec_l, spec_l, spec_l, spec_l, spec_l),
            out_specs=spec_l, check_rep=False,
        )
    if not has_rel:
        # dummies, sharded like q; body ignores them
        rel_h = jnp.zeros((B, nh, L, 8), q.dtype)
        rel_w = jnp.zeros((B, nh, L, 8), q.dtype)
    return fn(q, k, v, rel_h, rel_w)


def sp_attention_reference(q, k, v, rel_h, rel_w, scale):
    s = jnp.einsum("bnqc,bnkc->bnqk", q * scale, k, preferred_element_type=jnp.float32)
    if rel_h is not None:
        bias = rel_h[..., :, None] + rel_w[..., None, :]
        s = s + bias.reshape(*s.shape).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bnqk,bnkc->bnqc", p, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )
