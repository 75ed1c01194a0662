"""Windowed-block cost anatomy: where does the non-matmul time go?

The per-op int8 wins (1.2-1.6x, tools/microbench_a8.py) show up end-to-end
as only ~1% (BENCHMARKS.md round 2), which means the windowed block spends
most of its time outside the four big matmuls. This tool times isolated
stages of the block pipeline as carried ``lax.scan`` bodies (one dispatch,
sequential dependency — nothing can be CSE'd or overlapped away; a constant
rescale keeps magnitudes bounded without any sync-inducing reduction).

Stage list (all shape-preserving on the (1, G, G, C) token grid):

  noop       carried scale only — the scan-loop floor
  ln         LayerNorm
  partition  window partition + unpartition (pure data movement)
  qkv        partition -> qkv matmul -> nonlinear mix (unfoldable) -> unpart
  attn       partition -> full attention (qkv+core+proj, eager) -> unpart
  attn_fl    same with the fused flash kernel (augmented-contraction bias)
  mlp        ln2 -> lin1 -> GELU -> lin2 (+ fused variant when packed)
  full       the real block

Run: python tools/block_anatomy.py [--model vit_b] [--iters 64] [--a8]
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

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed_carry(f, x, iters, outer=5):
    """Time ``iters`` sequential applications of shape-preserving ``f`` in ONE
    dispatch (carried scan; the relay RTT amortizes to ~0). The carry is
    rescaled by a compile-time constant each step — no reduction, no sync."""

    from sam_quantization_tpu.ops.flash_attention import scoped_jit

    @scoped_jit
    def run(x):
        def body(x, _):
            y = f(x) * jnp.bfloat16(0.82)  # keep |x| bounded over 64 steps
            return y.astype(x.dtype), None

        y, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.mean(y)

    np.asarray(run(x))  # compile + warm
    times = []
    for _ in range(outer):
        t0 = time.perf_counter()
        np.asarray(run(x))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_b")
    ap.add_argument("--iters", type=int, default=256)
    ap.add_argument("--a8", action="store_true",
                    help="also time the int8-serving (IntLinear static) block")
    ap.add_argument("--int4", action="store_true",
                    help="also time the packed-int4 weight-only block")
    args = ap.parse_args()

    from sam_quantization_tpu.models import image_encoder as ie
    from sam_quantization_tpu.models.configs import CONFIGS
    from sam_quantization_tpu.nn import functional as F
    from sam_quantization_tpu.quant import gptq, sequential
    from sam_quantization_tpu.quant.context import NULL_CTX

    ecfg = CONFIGS[args.model].image_encoder
    C, ws = ecfg.embed_dim, ecfg.window_size
    G = ecfg.grid_size
    key = jax.random.PRNGKey(0)
    bp = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        ie.init_block(key, ecfg, 0),
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, G, G, C), jnp.bfloat16)

    param_sets = {"bf16": bp}
    qcfg = gptq.GPTQConfig(bits=4, groupsize=128, sym=True)
    qbp = sequential.rtn_quantize_encoder({"blocks": [bp]}, qcfg)["blocks"][0]
    if args.int4:
        param_sets["int4-w"] = qbp
    if args.a8:
        from sam_quantization_tpu.nn.packed import cache_int8

        param_sets["a8-static"] = cache_int8(
            qbp, act_scales={
                "attn.qkv": 8.0, "mlp.lin1": 8.0, "mlp.lin2": 8.0,
            },
        )

    for tag, p in param_sets.items():
        def noop(x):
            return x

        def ln(x, p=p):
            return F.layer_norm(p["norm1"], x, ecfg.ln_eps)

        def partition(x):
            yw, pad_hw = ie.window_partition(x, ws)
            return ie.window_unpartition(yw, ws, pad_hw, (G, G))

        def qkv(x, p=p):
            yw, pad_hw = ie.window_partition(x, ws)
            nw = yw.shape[0]
            y = F.linear(p["attn"]["qkv"], yw.reshape(nw, ws * ws, C))
            y3 = y.reshape(nw, ws * ws, 3, C)
            # nonlinear mix so XLA cannot fold the 3C->C reduction into w
            y = y3[:, :, 0] * jnp.tanh(y3[:, :, 1]) + y3[:, :, 2]
            return ie.window_unpartition(
                y.reshape(nw, ws, ws, C), ws, pad_hw, (G, G)
            )

        def attn(x, impl, p=p):
            yw, pad_hw = ie.window_partition(x, ws)
            yw = ie.attention(p["attn"], yw, ecfg, NULL_CTX, "attn", impl)
            return ie.window_unpartition(yw, ws, pad_hw, (G, G))

        def mlp(x, p=p):
            h = F.layer_norm(p["norm2"], x, ecfg.ln_eps)
            lin1, lin2 = p["mlp"]["lin1"], p["mlp"]["lin2"]
            if ie._use_fused_mlp(NULL_CTX, lin1, lin2, "auto"):
                from sam_quantization_tpu.ops import fused_mlp as fm

                return fm.fused_mlp(h, lin1, lin2)
            return F.linear(lin2, F.gelu(F.linear(lin1, h)))

        def full(x, impl="auto", p=p):
            return ie.block_apply(p, x, ecfg, 0, NULL_CTX, attn_impl=impl)

        stages = [
            ("noop", noop),
            ("ln", ln),
            ("partition", partition),
            ("part+qkv+mix", qkv),
            ("part+attn(eager)", lambda x: attn(x, "xla")),
            ("ln2+mlp", mlp),
            ("full block", full),
            # eager attention in the full block: the Pallas call is opaque
            # to XLA's scheduler, so the flash win per-stage can lose to
            # eager's cross-op overlap in the full pipeline
            ("full block (eager)", lambda x: full(x, "xla")),
        ]
        if jax.default_backend() == "tpu":
            stages.insert(5, ("part+attn(flash)", lambda x: attn(x, "flash")))
        print(f"[{args.model} windowed block, {tag}]", flush=True)
        floor = None
        for name, f in stages:
            t = timed_carry(f, x, args.iters)
            if name == "noop":
                # the dispatch RTT divided by iters plus the carry copy —
                # subtract it from every later stage
                floor = t
                print(f"  {name:24s} {1e3 * t:7.3f} ms (floor)", flush=True)
            else:
                print(f"  {name:24s} {1e3 * (t - floor):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
