"""Sweep flash-attention dispatch knobs at the real encoder shapes.

Two knobs the heuristic in ``flash_attention_relpos`` fixes today:
  * ``bw`` — windowed path: full (window × head) problems per program
    (heuristic: VMEM-budgeted, max 8)
  * ``block_q`` — global path: q-row block per program (heuristic: 256)

Timing is a carried ``lax.scan`` (one dispatch, sequential dependency —
relay-honest; cf. tools/block_anatomy.timed_carry).

Run: python tools/flash_sweep.py [--model vit_h] [--iters 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed_carry_attn(f, q, k, v, rel_h, rel_w, iters, outer=4):
    @jax.jit
    def run(q):
        def body(q, _):
            o = f(q, k, v, rel_h, rel_w)
            return (o * jnp.bfloat16(0.98) + q * jnp.bfloat16(0.02)).astype(
                q.dtype
            ), None

        q, _ = jax.lax.scan(body, q, None, length=iters)
        return jnp.mean(q)

    np.asarray(run(q))
    times = []
    for _ in range(outer):
        t0 = time.perf_counter()
        np.asarray(run(q))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_h")
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    from sam_quantization_tpu.models.configs import CONFIGS
    from sam_quantization_tpu.ops import flash_attention as fa

    ecfg = CONFIGS[args.model].image_encoder
    nh, hd = ecfg.num_heads, ecfg.head_dim
    ws = ecfg.window_size
    G = ecfg.grid_size
    nwin = ((G + ws - 1) // ws) ** 2

    key = jax.random.PRNGKey(0)

    def mk(shape):
        nonlocal key
        key, k2 = jax.random.split(key)
        return jax.random.normal(k2, shape, jnp.bfloat16)

    # windowed shape: B=nwin problems of L=ws*ws
    L = ws * ws
    q, k, v = (mk((nwin, nh, L, hd)) for _ in range(3))
    rel_h, rel_w = mk((nwin, nh, L, ws)), mk((nwin, nh, L, ws))
    BH = nwin * nh
    print(f"[windowed] BH={BH} L={L} hd={hd} kh=kw={ws}", flush=True)
    for bw in (None, 4, 8, 16, 20, 25, 40, 50):
        if bw is not None and BH % bw:
            continue

        def f(q, k, v, rh, rw, bw=bw):
            return fa.flash_attention_relpos(
                q, k, v, rh, rw, scale=hd**-0.5, bw_override=bw
            )

        t = timed_carry_attn(f, q, k, v, rel_h, rel_w, args.iters)
        print(f"  bw={bw!s:<5} {1e3 * t:7.3f} ms", flush=True)

    # global shape: one problem of L=G*G
    Lg = G * G
    qg, kg, vg = (mk((1, nh, Lg, hd)) for _ in range(3))
    rhg, rwg = mk((1, nh, Lg, G)), mk((1, nh, Lg, G))
    print(f"[global] BH={nh} L={Lg} hd={hd} kh=kw={G}", flush=True)
    for b3d in (False, True):
        for bq in (None, 128, 256, 512):

            def f(q, k, v, rh, rw, bq=bq, b3d=b3d):
                return fa.flash_attention_relpos(
                    q, k, v, rh, rw, scale=hd**-0.5,
                    block_q_override=bq, bias3d=b3d,
                )

            t = timed_carry_attn(f, qg, kg, vg, rhg, rwg, args.iters)
            tag = "bias3d" if b3d else "augmented"
            print(f"  {tag:<10} block_q={bq!s:<5} {1e3 * t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
