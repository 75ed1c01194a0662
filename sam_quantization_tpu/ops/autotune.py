"""On-device block-size autotuning for the fused quant matmul.

Counterpart of the reference's Triton autotuner
(gptq_triton/quant_linear.py:144-230 config table + utils.py:5-49 pruner,
custom_autotune.py): instead of a hand-annotated "3090" search space, this
sweeps candidate (block_m, block_n, block_k) tilings on the attached chip
and persists the winners to a JSON table that ``pick_blocks`` consults on
subsequent runs (the ``autotune_warmup`` analog, gptq_triton/__init__.py:84-105).
"""

from __future__ import annotations

import itertools
import json
import os
import time
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp

_TABLE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".samq_autotune.json",
)
_table: Optional[Dict[str, list]] = None


def _key(M: int, K: int, N: int, groupsize: int, bits: int) -> str:
    return f"{M}x{K}x{N}g{groupsize}b{bits}"


def load_table(path: str = _TABLE_PATH) -> Dict[str, list]:
    global _table
    if _table is None:
        try:
            with open(path) as f:
                _table = json.load(f)
        except (OSError, ValueError):
            _table = {}
    return _table


def lookup(M: int, K: int, N: int, groupsize: int, bits: int):
    """Tuned (block_m, block_n, block_k) or None."""
    hit = load_table().get(_key(M, K, N, groupsize, bits))
    return tuple(hit) if hit else None


def candidate_blocks(M: int, N: int, K: int, groupsize: int, pack_block: int):
    bms = [b for b in (128, 256, 512) if b <= max(M, 128)]
    bns = [b for b in (128, 256, 512) if N % b == 0]
    base = max(groupsize if 0 < groupsize < K else pack_block, pack_block)
    bks = []
    bk = base
    while bk <= min(K, 2048):
        if K % bk == 0:
            bks.append(bk)
        bk *= 2
    return [
        c for c in itertools.product(bms, bns, bks)
        # VMEM budget: x + qweight + acc + out tiles under ~10 MB
        if c[0] * c[2] * 2 + c[2] * c[1] + 2 * c[0] * c[1] * 4 < 10 * 2**20
    ]


def tune_shape(
    M: int, K: int, N: int, bits: int = 4, groupsize: int = 128,
    iters: int = 10, verbose: bool = False,
) -> Tuple[Tuple[int, int, int], float]:
    """Time every candidate tiling for one layer shape; returns (best, ms)."""
    from sam_quantization_tpu.nn import packed
    from sam_quantization_tpu.ops import quant_matmul

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.05
    p = packed.quantize_rtn(w, bits=bits, groupsize=groupsize)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)

    best, best_dt = None, float("inf")
    for bm, bn, bk in candidate_blocks(M, N, K, p.groupsize, p.pack_block):
        try:
            # Single-dispatch timing: iterate inside one jit (lax.scan with a
            # per-step input perturbation to defeat CSE) so the axon relay's
            # per-dispatch overhead and async-completion misreporting don't
            # skew the comparison; wall time / iters ≈ device time per call.
            def run(x, bm=bm, bn=bn, bk=bk):
                def step(acc, i):
                    xi = x + (i + 1).astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
                    return acc + _call_with_blocks(xi, p, bm, bn, bk), ()

                acc, _ = jax.lax.scan(
                    step, jnp.zeros((x.shape[0], N), x.dtype), jnp.arange(iters)
                )
                return jnp.mean(acc)

            fn = jax.jit(run)
            import numpy as _np

            _np.asarray(fn(x))  # compile + materialize
            t0 = time.perf_counter()
            _np.asarray(fn(x))
            dt = (time.perf_counter() - t0) / iters
        except Exception as e:  # unsupported tiling on this target
            if verbose:
                print(f"  ({bm},{bn},{bk}) failed: {type(e).__name__}")
            continue
        if verbose:
            print(f"  ({bm},{bn},{bk}): {dt * 1e3:.3f} ms")
        if dt < best_dt:
            best, best_dt = (bm, bn, bk), dt
    if best is None:
        raise RuntimeError("no candidate tiling compiled")
    return best, best_dt * 1e3


def _call_with_blocks(x, p, bm, bn, bk):
    from sam_quantization_tpu.ops import quant_matmul as qm

    M, K = x.shape
    N = p.out_features
    Mp = qm._round_up(M, bm)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    gpb = max(bk // p.groupsize, 1)
    num_k = K // bk
    scales, zeros = p.scales, p.zeros
    if scales.shape[0] != num_k * gpb:
        reps = num_k * gpb // scales.shape[0]
        scales = jnp.repeat(scales, reps, axis=0)
        zeros = jnp.repeat(zeros, reps, axis=0)
    scales = scales.reshape(num_k, gpb, N)
    zeros = zeros.reshape(num_k, gpb, N)
    out = qm._qmm_call(
        x, p.qweight, scales, zeros,
        p.qweight_hi,  # bits=3 split-plane high bit (None otherwise)
        bits=p.bits, groupsize=min(p.groupsize, bk), pack_block=p.pack_block,
        block_m=bm, block_n=bn, block_k=bk, interpret=qm.INTERPRET,
    )
    return out[:M]


def tune_model_shapes(
    model: str = "vit_h", M: int = 4096, bits: int = 4, groupsize: int = 128,
    path: str = _TABLE_PATH, verbose: bool = True,
) -> Dict[str, list]:
    """Tune all encoder linear shapes of a model config and persist."""
    from sam_quantization_tpu.models.configs import CONFIGS

    ecfg = CONFIGS[model].image_encoder
    C, H = ecfg.embed_dim, ecfg.mlp_dim
    table = dict(load_table(path))
    for K, N in [(C, 3 * C), (C, C), (C, H), (H, C)]:
        best, ms = tune_shape(M, K, N, bits, groupsize, verbose=verbose)
        table[_key(M, K, N, groupsize, bits)] = list(best)
        if verbose:
            print(f"{model} {K}x{N}: best {best} @ {ms:.3f} ms")
    with open(path, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    global _table
    _table = table
    return table
