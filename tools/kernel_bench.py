"""Kernel microbenchmarks on the attached accelerator.

Times the fused quant-matmul variants, the fused MLP, and the attention
kernel against their XLA/bf16 baselines at SAM shapes. Everything is
generated on-device (no host transfers — they dominate through remote
tunnels) and timed with pipelined async dispatches.

Usage: python tools/kernel_bench.py [--model vit_h] [--m 4096]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(name, fn, x, iters=30, flops=None):
    r = fn(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(x)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    extra = f"  {flops / dt / 1e12:.1f} T/s" if flops else ""
    print(f"{name:<28s} {dt * 1e3:8.3f} ms{extra}", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_h", choices=["vit_b", "vit_l", "vit_h"])
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from sam_quantization_tpu.models.configs import CONFIGS
    from sam_quantization_tpu.nn import packed
    from sam_quantization_tpu.ops import flash_attention, fused_mlp, quant_matmul

    ecfg = CONFIGS[args.model].image_encoder
    C, H = ecfg.embed_dim, ecfg.mlp_dim
    M = args.m
    key = jax.random.PRNGKey(0)
    shapes = {
        "qkv": (C, 3 * C),
        "proj": (C, C),
        "lin1": (C, H),
        "lin2": (H, C),
    }
    for name, (K, N) in shapes.items():
        w = jax.random.normal(key, (K, N), jnp.float32) * 0.05
        wb = w.astype(jnp.bfloat16)
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        flops = 2 * M * K * N
        print(f"--- {name} (M={M}, K={K}, N={N}) ---")
        timeit("bf16 dense", jax.jit(lambda x, wb=wb: jnp.dot(
            x, wb, preferred_element_type=jnp.float32).astype(jnp.bfloat16)),
            x, args.iters, flops)
        p4 = packed.quantize_rtn(w, bits=4, groupsize=128)
        timeit("w4a16 pallas", jax.jit(
            lambda x, p=p4: quant_matmul.quant_matmul_pallas(x, p)),
            x, args.iters, flops)
        p4s = dataclasses.replace(
            packed.quantize_rtn(w, bits=4, groupsize=0, sym=True), act_bits=8
        )
        timeit("w4a8 sym pallas", jax.jit(
            lambda x, p=p4s: quant_matmul.quant_matmul_a8_pallas(x, p)),
            x, args.iters, flops)
        p8s = dataclasses.replace(
            packed.quantize_rtn(w, bits=8, groupsize=0, sym=True), act_bits=8
        )
        timeit("w8a8 sym pallas", jax.jit(
            lambda x, p=p8s: quant_matmul.quant_matmul_a8_pallas(x, p)),
            x, args.iters, flops)

    # fused MLP
    print(f"--- fused mlp (M={M}, C={C}, H={H}) ---")
    w1 = jax.random.normal(key, (C, H), jnp.float32) * 0.05
    w2 = jax.random.normal(key, (H, C), jnp.float32) * 0.05
    x = jax.random.normal(key, (M, C), jnp.bfloat16)
    p1 = packed.quantize_rtn(w1, bits=4, groupsize=128)
    p2 = packed.quantize_rtn(w2, bits=4, groupsize=128)
    flops = 4 * M * C * H
    timeit("fused mlp w4", jax.jit(
        lambda x: fused_mlp.fused_mlp(x, p1, p2)), x, args.iters, flops)
    w1b, w2b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
    timeit("bf16 mlp (xla)", jax.jit(
        lambda x: jax.nn.gelu(x @ w1b, approximate=True) @ w2b), x, args.iters, flops)

    # attention, windowed + global SAM shapes
    nh, hd = ecfg.num_heads, ecfg.head_dim
    for tag, (B, L, kh) in {
        "windowed": (25, ecfg.window_size**2, ecfg.window_size),
        "global": (1, ecfg.grid_size**2, ecfg.grid_size),
    }.items():
        q = jax.random.normal(key, (B, nh, L, hd), jnp.bfloat16)
        rh = jax.random.normal(key, (B, nh, L, kh), jnp.bfloat16) * 0.1
        rw = jax.random.normal(key, (B, nh, L, L // kh), jnp.bfloat16) * 0.1
        flops = 4 * B * nh * L * L * hd
        print(f"--- attention {tag} (B={B}, nh={nh}, L={L}, hd={hd}) ---")
        timeit("flash pallas", jax.jit(
            lambda q, rh=rh, rw=rw: flash_attention.flash_attention_relpos(
                q, q, q, rh, rw, hd**-0.5)), q, args.iters, flops)
        timeit("eager xla", jax.jit(
            lambda q, rh=rh, rw=rw: flash_attention.attention_reference(
                q, q, q, rh, rw, hd**-0.5)), q, args.iters, flops)


if __name__ == "__main__":
    sys.exit(main())
