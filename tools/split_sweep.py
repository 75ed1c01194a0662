"""Sweep the round-4 split-chain knobs on chip at ViT-H serving shapes.

- windowed packed kernel: hsplit (independent head-group chains/program)
- global bias3d kernel: (block_q, halves) with the clamped softmax

Carried-scan timing (one dispatch), production entry points.

Run: python tools/split_sweep.py [--iters 64]
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


def timed_carry(f, x, iters, outer=4):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_h")
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    from sam_quantization_tpu.models.configs import CONFIGS
    from sam_quantization_tpu.ops import flash_attention as fa

    ecfg = CONFIGS[args.model].image_encoder
    nh, hd, ws, G = (ecfg.num_heads, ecfg.head_dim, ecfg.window_size,
                     ecfg.grid_size)
    NW = ((G + ws - 1) // ws) ** 2
    L = ws * ws
    CH = nh * hd
    key = jax.random.PRNGKey(0)

    def mk(shape, scale=1.0):
        nonlocal key
        key, k2 = jax.random.split(key)
        return jax.random.normal(k2, shape, jnp.bfloat16) * scale

    qkv = mk((NW, L, 3 * CH), 0.5)
    rel = mk((NW, nh, L, 2 * ws), 0.05)

    t0 = timed_carry(lambda x: x * jnp.bfloat16(1.01), qkv, args.iters)
    print(f"[split sweep] {args.model}: windowed NW={NW} L={L}")
    print(f"  scan floor             {1e3 * t0:7.3f} ms", flush=True)

    def win(hs):
        def f(x):
            o = fa.flash_attention_qkv_packed(
                x, rel, hd**-0.5, nh=nh, hd=hd, kh=ws, kw=ws,
                out_inv_scale=jnp.float32(8.0), hsplit_override=hs,
            )
            o = o.astype(jnp.bfloat16) * jnp.bfloat16(1 / 127)
            return jnp.concatenate([o, x[:, :, CH:]], axis=-1)

        return f

    for hs in (1, 2, 4):
        t = timed_carry(win(hs), qkv, args.iters)
        print(f"  windowed hsplit={hs}      {1e3 * (t - t0):7.3f} ms",
              flush=True)

    # global bias3d sweep
    Lg = G * G
    BH = nh
    q = mk((BH, Lg, hd), 0.5)
    rh = mk((BH, Lg, G), 0.05)
    rw = mk((BH, Lg, G), 0.05)
    t0g = timed_carry(lambda x: x * jnp.bfloat16(1.01), q, args.iters)
    print(f"  global floor           {1e3 * t0g:7.3f} ms", flush=True)

    def glob(bq, hv, clamp):
        def f(x):
            o = fa._fused_attention_bias3d(
                x, q, q, rh, rw, None, kh=G, kw=G, block_q=bq,
                interpret=False, exp2=True, halves=hv, clamp=clamp,
            )
            return o

        return f

    for bq, hv in [(256, 2), (256, 4), (512, 2), (512, 4), (128, 2)]:
        t = timed_carry(glob(bq, hv, True), q, args.iters)
        print(f"  global bq={bq} hv={hv} cl=1 {1e3 * (t - t0g):7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
