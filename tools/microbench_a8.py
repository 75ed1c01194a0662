"""Per-op device-honest microbench: bf16 vs native-int8 dots at exact SAM
layer shapes.

Answers one question: how much of the int8 MXU's nominal 2x rate survives
at the encoder's real (M, K, N) through XLA? Method: one jitted ``lax.scan``
over ``reps`` STACKED DISTINCT inputs (nothing can be CSE'd), accumulating a
scalar (so the axon relay transfers ~8 bytes, not the operand). Three
variants isolate the costs:

  bf16        x @ w                              (the baseline op)
  int8-pre    xq @ w8 -> int32, scale            (pure int8 dot + epilogue)
  int8-static quantize(x) -> xq @ w8 -> scale    (the full serving-path op)

Run: python tools/microbench_a8.py [--model vit_b] [--reps 32]
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


def timed_scan(op, xs, iters, outer=5):
    """op: xi -> scalar f32. ONE dispatch runs ``iters`` sequential ops over
    the (few) stacked distinct inputs, mod-indexed — iters >> len(xs) so the
    ~26 ms relay round-trip amortizes below 1%% without needing iters copies
    of the operand in HBM. The scalar accumulator forces execution; the
    dynamic index defeats CSE."""

    @jax.jit
    def run(xs):
        def body(acc, i):
            xi = xs[i % xs.shape[0]]
            return acc + op(xi), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    np.asarray(run(xs))  # compile + warm, force real materialization
    times = []
    for _ in range(outer):
        t0 = time.perf_counter()
        np.asarray(run(xs))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


def bench_linear(M, K, N, reps):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    n_distinct = min(reps, max(1, int(2e9 / (M * K * 2))))  # cap HBM use
    xs = jax.random.normal(k1, (n_distinct, M, K), jnp.bfloat16)
    xqs = jax.random.randint(k1, (n_distinct, M, K), -127, 128, jnp.int8)
    wb = jax.random.normal(k2, (K, N), jnp.bfloat16) * 0.02
    w8 = jax.random.randint(k3, (K, N), -127, 128, jnp.int8)
    s_col = jnp.full((N,), 0.01, jnp.float32)
    in_scale = jnp.float32(0.05)

    def bf16_op(x):
        y = jnp.dot(x, wb, preferred_element_type=jnp.float32)
        return jnp.sum(y)

    def int8_pre_op(xq):
        acc = jax.lax.dot_general(
            xq, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        return jnp.sum(acc * s_col[None, :] * in_scale)

    def int8_static_op(x):
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / in_scale), -127, 127
        ).astype(jnp.int8)
        return int8_pre_op(xq)

    # weights stored transposed (N, K), both operands contract dim 1 — the
    # MXU ingests the stationary operand differently; measured faster at
    # 4096^3 in tools/microbench_int4.py, checked here at layer shapes
    w8t = jnp.asarray(np.asarray(w8).T)

    def int8_preT_op(xq):
        acc = jax.lax.dot_general(
            xq, w8t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        return jnp.sum(acc * s_col[None, :] * in_scale)

    iters = 16 * reps
    t_bf = timed_scan(bf16_op, xs, iters)
    t_pre = timed_scan(int8_pre_op, xqs, iters)
    t_sta = timed_scan(int8_static_op, xs, iters)
    t_preT = timed_scan(int8_preT_op, xqs, iters)
    gf = 2 * M * K * N / 1e9
    print(
        f"  M={M} K={K} N={N}: bf16 {1e3 * t_bf:.3f} ms ({gf / t_bf / 1e3:.0f}"
        f" TF/s)  int8-pre {1e3 * t_pre:.3f} ms ({gf / t_pre / 1e3:.0f} TOP/s)"
        f"  int8-static {1e3 * t_sta:.3f} ms  int8-preT {1e3 * t_preT:.3f} ms"
        f"  ratios pre {t_bf / t_pre:.2f}x / static {t_bf / t_sta:.2f}x"
        f" / preT {t_bf / t_preT:.2f}x",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_b")
    ap.add_argument("--reps", type=int, default=32)
    args = ap.parse_args()

    from sam_quantization_tpu.models.configs import CONFIGS

    e = CONFIGS[args.model].image_encoder
    d = e.embed_dim
    M = 25 * 196 if args.model in ("vit_b", "vit_l", "vit_h") else 4096
    print(f"{args.model}: embed_dim={d}, M(windowed-padded)={M}", flush=True)
    for K, N, tag in [
        (d, 3 * d, "qkv"),
        (d, d, "proj"),
        (d, 4 * d, "lin1"),
        (4 * d, d, "lin2"),
    ]:
        print(f"[{tag}]", flush=True)
        bench_linear(M, K, N, args.reps)
    print("[4096^3 sanity]", flush=True)
    bench_linear(4096, 4096, 4096, 8)


if __name__ == "__main__":
    main()
