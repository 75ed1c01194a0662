"""Serving-MLP headroom probe (VERDICT r4 #3).

The int8 serving block pays ln2 + lin1 + GELU + requant + lin2 as separate
XLA ops (~0.32 of the 1.00 ms windowed block at ViT-H) and the round-4
verdict asks for a fused kernel. Before building one, measure where the
time actually goes at the exact serving shapes:

  dots      the two int8 dots ALONE on pre-quantized input (the floor any
            fusion must beat — Mosaic's in-kernel int8 dot does not hit
            XLA's double-rate path, so a Pallas fusion cannot go below it)
  chain     the full serving chain (ln2 -> static-quant -> dot1 -> scale +
            bias -> GELU -> static-quant -> dot2 -> scale + bias), i.e.
            what the block runs today
  bf16      the bf16 dense chain for reference

chain - dots = everything a fused kernel could possibly recover (the
elementwise stages XLA failed to hide). Run on the TPU:

  python tools/mlp_serving_probe.py [--dim 1280] [--hidden 5120] [--m 4096]
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


def timed_carry(f, x, iters=64, outer=5):
    @jax.jit
    def run(x):
        def body(x, _):
            y = f(x)
            return (y * jnp.bfloat16(0.9) + x * jnp.bfloat16(0.1)).astype(
                x.dtype
            ), None

        y, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.mean(y.astype(jnp.float32))

    np.asarray(run(x))
    times = []
    for _ in range(outer):
        t0 = time.perf_counter()
        np.asarray(run(x))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=1280)
    ap.add_argument("--hidden", type=int, default=5120)
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()
    C, H, M = args.dim, args.hidden, args.m

    key = jax.random.PRNGKey(0)
    w1 = jax.random.normal(key, (H, C), jnp.float32) * 0.02  # nk layout
    w2 = jax.random.normal(key, (C, H), jnp.float32) * 0.02
    w1_8 = jnp.clip(jnp.round(w1 / jnp.max(jnp.abs(w1)) * 127), -127, 127).astype(jnp.int8)
    w2_8 = jnp.clip(jnp.round(w2 / jnp.max(jnp.abs(w2)) * 127), -127, 127).astype(jnp.int8)
    s1 = jnp.full((H,), 1e-3, jnp.float32)
    s2 = jnp.full((C,), 1e-3, jnp.float32)
    b1 = jnp.zeros((H,), jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)
    g = jnp.ones((C,), jnp.float32)
    bln = jnp.zeros((C,), jnp.float32)
    in_s1, in_s2 = jnp.float32(0.05), jnp.float32(0.05)

    x = jax.random.normal(jax.random.PRNGKey(1), (M, C), jnp.bfloat16)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / in_s1), -127, 127).astype(jnp.int8)

    def dots(xq):
        a = jax.lax.dot_general(xq, w1_8, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        aq = jnp.clip(a >> 7, -127, 127).astype(jnp.int8)  # cheap stand-in requant
        y = jax.lax.dot_general(aq, w2_8, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y

    t_dots = timed_carry(
        lambda z: (dots((z * 64).astype(jnp.int8)).astype(jnp.float32)
                   * 1e-6).astype(jnp.bfloat16)[:, :C],
        x, args.iters,
    )

    def chain(x):
        # EXACTLY the serving block's ops: F.layer_norm (f32 internals, bf16
        # out), int8_matmul static path (round/clip from bf16, int8 dot,
        # fused column scale, bf16 out), F.gelu (tanh approx at bf16).
        from sam_quantization_tpu.nn import functional as F

        hln = F.layer_norm({"w": g, "b": bln}, x, 1e-6)
        xq = jnp.clip(
            jnp.round(hln.astype(jnp.float32) * (1.0 / in_s1)), -127, 127
        ).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w1_8, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32).astype(jnp.float32)
        h = (acc * (s1 * in_s1)[None, :] + b1[None, :]).astype(jnp.bfloat16)
        h = F.gelu(h)
        hq = jnp.clip(
            jnp.round(h.astype(jnp.float32) * (1.0 / in_s2)), -127, 127
        ).astype(jnp.int8)
        acc2 = jax.lax.dot_general(hq, w2_8, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32).astype(jnp.float32)
        y = acc2 * (s2 * in_s2)[None, :] + b2[None, :]
        return y.astype(jnp.bfloat16)

    t_chain = timed_carry(chain, x, args.iters)

    w1b = w1.astype(jnp.bfloat16).T
    w2b = w2.astype(jnp.bfloat16).T

    def chain_bf16(x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        hln = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * g + bln).astype(jnp.bfloat16)
        h = jnp.dot(hln, w1b, preferred_element_type=jnp.float32) + b1[None, :]
        h = jax.nn.gelu(h.astype(jnp.bfloat16).astype(jnp.float32), approximate=False)
        y = jnp.dot(h.astype(jnp.bfloat16), w2b,
                    preferred_element_type=jnp.float32) + b2[None, :]
        return y.astype(jnp.bfloat16)

    t_bf16 = timed_carry(chain_bf16, x, args.iters)

    t_floor = timed_carry(lambda z: z, x, args.iters)

    flops = 2 * 2 * M * C * H
    print(f"shapes M={M} C={C} H={H}  ({flops / 1e9:.1f} GFLOP/chain)")
    print(f"  carry floor    : {t_floor * 1e3:.3f} ms (subtract for "
          f"absolute stage cost; cancels in chain-dots)")
    print(f"  int8 dots only : {t_dots * 1e3:.3f} ms  "
          f"({flops / t_dots / 1e12:.1f} TOP/s)")
    print(f"  serving chain  : {t_chain * 1e3:.3f} ms  "
          f"({flops / t_chain / 1e12:.1f} TOP/s)")
    print(f"  bf16 chain     : {t_bf16 * 1e3:.3f} ms  "
          f"({flops / t_bf16 / 1e12:.1f} TFLOP/s)")
    print(f"  fusion headroom (chain - dots): {(t_chain - t_dots) * 1e3:.3f} ms "
          f"({100 * (t_chain - t_dots) / t_chain:.1f}% of chain)")


if __name__ == "__main__":
    main()
