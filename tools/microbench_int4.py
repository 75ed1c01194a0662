"""Does XLA/v5e expose a faster-than-int8 narrow-int MXU mode?

Round-2 measured the realized int8 ceiling at 159 TOP/s (1.49x bf16's 107)
at 4096^3 through XLA-native dots, and that Mosaic's in-kernel int8 dots do
NOT engage the double-rate path (BENCHMARKS.md). This probes the remaining
dtype/layout space through XLA-native dots only:

  bf16          x @ w                          baseline
  int8          int8 x int8 -> int32           the serving path's dot
  int8-T        same, weights stored (N, K)    layout sensitivity
  int4          int4 x int4 -> int32           native narrow dtype (jnp.int4)
  int4w-int8a   int8 x int4 -> int32           mixed-width
  int8->bf16    int8 dot, preferred bf16 acc   accumulator-width sensitivity

Run on the chip: python tools/microbench_int4.py [--shapes 4096 | vit_h]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from microbench_a8 import timed_scan  # noqa: E402


def bench(M, K, N, reps=8):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    n_distinct = min(reps, max(1, int(2e9 / (M * K * 2))))
    xs = jax.random.normal(k1, (n_distinct, M, K), jnp.bfloat16)
    xq = jax.random.randint(k1, (n_distinct, M, K), -127, 128, jnp.int8)
    x4 = jnp.clip(xq, -7, 7).astype(jnp.int4)
    wb = jax.random.normal(k2, (K, N), jnp.bfloat16) * 0.02
    w8 = jax.random.randint(k2, (K, N), -127, 128, jnp.int8)
    w8t = jnp.asarray(w8.T)
    w4 = jnp.clip(w8, -7, 7).astype(jnp.int4)

    dn_kn = (((1,), (0,)), ((), ()))
    dn_nk = (((1,), (1,)), ((), ()))

    cases = {
        "bf16": (
            xs,
            lambda x: jnp.sum(
                jax.lax.dot_general(x, wb, dn_kn, preferred_element_type=jnp.float32)
            ),
        ),
        "int8": (
            xq,
            lambda x: jnp.sum(
                jax.lax.dot_general(x, w8, dn_kn, preferred_element_type=jnp.int32)
            ).astype(jnp.float32),
        ),
        "int8-T": (
            xq,
            lambda x: jnp.sum(
                jax.lax.dot_general(x, w8t, dn_nk, preferred_element_type=jnp.int32)
            ).astype(jnp.float32),
        ),
        "int4": (
            x4,
            lambda x: jnp.sum(
                jax.lax.dot_general(x, w4, dn_kn, preferred_element_type=jnp.int32)
            ).astype(jnp.float32),
        ),
        "int4w-int8a": (
            xq,
            lambda x: jnp.sum(
                jax.lax.dot_general(x, w4, dn_kn, preferred_element_type=jnp.int32)
            ).astype(jnp.float32),
        ),
        "int8->f32acc": (
            xq,
            lambda x: jnp.sum(
                jax.lax.dot_general(x, w8, dn_kn, preferred_element_type=jnp.float32)
            ),
        ),
    }
    gf = 2 * M * K * N / 1e9
    print(f"M={M} K={K} N={N} ({gf:.1f} GFLOP)", flush=True)
    for tag, (data, op) in cases.items():
        try:
            t = timed_scan(op, data, 16 * reps)
            print(f"  {tag:14s} {1e3 * t:7.3f} ms  {gf / t / 1e3:6.0f} T/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {tag:14s} FAILED: {str(e)[:120]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="4096")
    args = ap.parse_args()
    if args.shapes == "4096":
        bench(4096, 4096, 4096)
    else:
        d = 1280
        for K, N in [(d, 3 * d), (d, d), (d, 4 * d), (4 * d, d)]:
            bench(4900, K, N, reps=16)


if __name__ == "__main__":
    main()
