"""Decompose the packed windowed flash kernel's time at serving shapes.

The round-4 anatomy (tools/block_anatomy.py, ViT-H a8-static) shows the
windowed block spends ~0.68 ms in the attention stage (qkv+core+proj)
against 0.32 ms for the whole int8 MLP — while the flash core's MXU work
is only ~13 GFLOP vs the MLP's 128. This probe times the packed kernel
(ops/flash_attention._attn_kernel_qkv_packed) next to stripped variants at
the exact encoder shape to locate the cost:

  full        the production kernel (rel bias + softmax + int8-out)
  no-quant    same, bf16 out (epilogue cost)
  no-rel      rel=None (augmentation cost)
  no-softmax  dots only, max-subtract/exp/sum removed (softmax cost)
  dots-floor  two batched dots on pre-split (nh, Lp, 128) heads, no
              in-kernel slicing/concat (the per-head VMEM shuffle cost)
  presplit    production math but on pre-split padded heads laid out by
              XLA in HBM (is the no-transpose packing actually winning?)

Timing: carried lax.scan, one dispatch (tools/block_anatomy.timed_carry).

Run: python tools/packed_probe.py [--model vit_h] [--iters 64]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed_carry(f, x, iters, outer=4):
    """One-dispatch carried scan over f (shape/dtype-preserving on x)."""

    @jax.jit
    def run(x):
        def body(x, _):
            y = f(x)
            return (y * jnp.bfloat16(0.9) + x * jnp.bfloat16(0.1)).astype(
                x.dtype
            ), None

        x, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.mean(x)

    np.asarray(run(x))
    times = []
    for _ in range(outer):
        t0 = time.perf_counter()
        np.asarray(run(x))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


# ---------------- stripped kernel variants (probe-only) ----------------


def _kernel_no_softmax(q_ref, k_ref, v_ref, rel_ref, o_ref, *, nh, hd, scale):
    """Production slicing/augmentation but dots only — no softmax chain."""
    Lp = q_ref.shape[1]
    dt = q_ref.dtype
    qa_l, ka_l, v_l = [], [], []
    for h in range(nh):
        q = q_ref[0][:, h * hd : (h + 1) * hd]
        k = k_ref[0][:, h * hd : (h + 1) * hd]
        v = v_ref[0][:, h * hd : (h + 1) * hd]
        qs = (q.astype(jnp.float32) * scale).astype(dt)
        qa_l.append(jnp.concatenate([qs, rel_ref[0, h]], -1))
        ka_l.append(jnp.concatenate([k, rel_ref[0, h]], -1))
        v_l.append(v)
    qa, ka, vv = jnp.stack(qa_l), jnp.stack(ka_l), jnp.stack(v_l)
    s = jax.lax.dot_general(
        qa, ka, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o = jax.lax.dot_general(
        s.astype(vv.dtype), vv, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    for h in range(nh):
        o_ref[0, :, h * hd : (h + 1) * hd] = o[h].astype(o_ref.dtype)


def _kernel_dots_floor(q_ref, k_ref, v_ref, o_ref):
    """Two batched dots on pre-split (nh, Lp, D) heads — the MXU+IO floor."""
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o = jax.lax.dot_general(
        s.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _kernel_presplit(q_ref, k_ref, v_ref, o_ref, *, exp2):
    """Production softmax math on pre-split heads (no in-kernel slicing)."""
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m) if exp2 else jnp.exp(s - m)
    r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o * r).astype(o_ref.dtype)


def _call_heads(kernel, NW, nh, Lp, D, dtype=jnp.bfloat16, n_in=3):
    specs = [
        pl.BlockSpec((1, nh, Lp, D), lambda i: (i, 0, 0, 0))
        for _ in range(n_in)
    ]

    def f(*ops):
        return pl.pallas_call(
            kernel,
            grid=(NW,),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, nh, Lp, D), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NW, nh, Lp, D), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(*ops)

    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_h")
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    from sam_quantization_tpu.models.configs import CONFIGS
    from sam_quantization_tpu.ops import flash_attention as fa

    ecfg = CONFIGS[args.model].image_encoder
    nh, hd, ws = ecfg.num_heads, ecfg.head_dim, ecfg.window_size
    G = ecfg.grid_size
    NW = ((G + ws - 1) // ws) ** 2
    L = ws * ws
    Lp = fa._round_up(L, 128)
    CH = nh * hd
    scale = hd**-0.5

    key = jax.random.PRNGKey(0)

    def mk(shape, dt=jnp.bfloat16):
        nonlocal key
        key, k2 = jax.random.split(key)
        return jax.random.normal(k2, shape, dt)

    qkv = mk((NW, L, 3 * CH))
    rel = mk((NW, nh, L, 2 * ws)) * 0.05
    print(
        f"[packed probe] {args.model}: NW={NW} L={L} Lp={Lp} nh={nh} hd={hd}",
        flush=True,
    )

    # dispatch floor of the carried scan
    t0 = timed_carry(lambda x: x * jnp.bfloat16(1.01), qkv, args.iters)
    print(f"  scan floor               {1e3 * t0:7.3f} ms", flush=True)

    def full(x):
        o = fa.flash_attention_qkv_packed(
            x, rel, scale, nh=nh, hd=hd, kh=ws, kw=ws,
            out_inv_scale=jnp.float32(8.0),
        )
        # int8 -> carry dtype, padded back to the carry shape
        o = o.astype(jnp.bfloat16) * jnp.bfloat16(1 / 127)
        return jnp.concatenate([o, x[:, :, CH:]], axis=-1)

    def noquant(x):
        o = fa.flash_attention_qkv_packed(
            x, rel, scale, nh=nh, hd=hd, kh=ws, kw=ws,
        )
        return jnp.concatenate([o, x[:, :, CH:]], axis=-1)

    def norel(x):
        o = fa.flash_attention_qkv_packed(
            x, None, scale, nh=nh, hd=hd, kh=ws, kw=ws,
        )
        return jnp.concatenate([o, x[:, :, CH:]], axis=-1)

    for name, f in [("full (int8-out)", full), ("no-quant", noquant),
                    ("no-rel", norel)]:
        t = timed_carry(f, qkv, args.iters)
        print(f"  {name:24s} {1e3 * (t - t0):7.3f} ms", flush=True)

    # production-shaped packed input, stripped kernel. NOTE: like the
    # production kernel this reads Lp-row blocks from the L-row array (OOB
    # rows are garbage) but has no masking — outputs may be NaN. Timing
    # only; the carry mix keeps the program shape-stable regardless.
    def ns(x):
        q = x[:, :, :CH]
        k = x[:, :, CH : 2 * CH]
        v = x[:, :, 2 * CH :]
        kern = functools.partial(
            _kernel_no_softmax, nh=nh, hd=hd, scale=scale
        )
        out = pl.pallas_call(
            kern,
            grid=(NW,),
            in_specs=[
                pl.BlockSpec((1, Lp, CH), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, Lp, CH), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, Lp, CH), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, nh, Lp, 2 * ws), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Lp, CH), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NW, Lp, CH), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(q, k, v, jnp.pad(rel, ((0, 0), (0, 0), (0, Lp - L), (0, 0))))
        return jnp.concatenate(
            [out[:, :L], x[:, :, CH:]], axis=-1
        )

    t = timed_carry(ns, qkv, args.iters)
    print(f"  {'no-softmax (packed in)':24s} {1e3 * (t - t0):7.3f} ms",
          flush=True)

    # pre-split padded heads (nh, Lp, 128): XLA does the transpose+pad in HBM
    Dp = 128

    def presplit_prep(x):
        def split(a):
            return jnp.pad(
                a.reshape(NW, L, nh, hd).transpose(0, 2, 1, 3),
                ((0, 0), (0, 0), (0, Lp - L), (0, Dp - hd)),
            )

        return (
            split(x[:, :, :CH]),
            split(x[:, :, CH : 2 * CH]),
            split(x[:, :, 2 * CH :]),
        )

    presplit_dots = _call_heads(_kernel_dots_floor, NW, nh, Lp, Dp)
    presplit_smax = _call_heads(
        functools.partial(_kernel_presplit, exp2=True), NW, nh, Lp, Dp
    )

    def floor_f(x):
        q, k, v = presplit_prep(x)
        o = presplit_dots(q, k, v)
        return jnp.concatenate(
            [o[:, :, :L, :hd].transpose(0, 2, 1, 3).reshape(NW, L, CH),
             x[:, :, CH:]],
            axis=-1,
        )

    def presm_f(x):
        q, k, v = presplit_prep(x)
        o = presplit_smax(q, k, v)
        return jnp.concatenate(
            [o[:, :, :L, :hd].transpose(0, 2, 1, 3).reshape(NW, L, CH),
             x[:, :, CH:]],
            axis=-1,
        )

    for name, f in [("dots-floor (presplit)", floor_f),
                    ("softmax (presplit)", presm_f)]:
        t = timed_carry(f, qkv, args.iters)
        print(f"  {name:24s} {1e3 * (t - t0):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
