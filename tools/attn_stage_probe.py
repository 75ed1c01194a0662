"""Time each sub-op of the windowed attention stage in int8 serving mode.

Round-4 follow-up to tools/packed_probe.py: the flash kernel itself is only
~0.21 ms/block at ViT-H, yet the full attention stage (partition + qkv +
rel einsums + kernel + proj + unpartition) measures ~0.70 ms — while the
MLP's two int8 dots (2x the FLOPs) take 0.32 ms. This probe times the
pieces one at a time (carried lax.scan, one dispatch) to find the slow
one, and contrasts the same IntLinear at M=4900 (windowed-partitioned)
vs M=4096 (flat) to isolate any M-alignment effect.

Run: python tools/attn_stage_probe.py [--model vit_h] [--iters 64]
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
    ap.add_argument("--iters", type=int, default=256)
    args = ap.parse_args()

    from sam_quantization_tpu.models import image_encoder as ie
    from sam_quantization_tpu.models.configs import CONFIGS
    from sam_quantization_tpu.nn import functional as F
    from sam_quantization_tpu.nn.packed import cache_int8
    from sam_quantization_tpu.quant import gptq, sequential
    from sam_quantization_tpu.quant.context import NULL_CTX

    ecfg = CONFIGS[args.model].image_encoder
    C, ws, G = ecfg.embed_dim, ecfg.window_size, ecfg.grid_size
    nh, hd = ecfg.num_heads, ecfg.head_dim
    NW = ((G + ws - 1) // ws) ** 2
    L = ws * ws
    key = jax.random.PRNGKey(0)
    bp = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        ie.init_block(key, ecfg, 0),
    )
    qcfg = gptq.GPTQConfig(bits=4, groupsize=128, sym=True)
    qbp = sequential.rtn_quantize_encoder({"blocks": [bp]}, qcfg)["blocks"][0]
    sp = cache_int8(
        qbp,
        act_scales={"attn.qkv": 8.0, "attn.proj": 8.0,
                    "mlp.lin1": 8.0, "mlp.lin2": 8.0},
        skip=(),  # proj stays IntLinear (the ViT-H serving route)
    )

    xw = jax.random.normal(jax.random.PRNGKey(1), (NW, ws, ws, C), jnp.bfloat16)
    x2 = xw.reshape(NW * L, C)
    xflat = x2[: G * G]  # (4096, C) — the MLP's M

    t0 = timed_carry(lambda x: x * jnp.bfloat16(1.01), xw, args.iters)
    print(f"[{args.model} attn-stage probe] NW={NW} L={L} C={C}")
    print(f"  scan floor               {1e3 * t0:7.3f} ms", flush=True)

    qkv_p, proj_p = sp["attn"]["qkv"], sp["attn"]["proj"]
    mlp1 = sp["mlp"]["lin1"]

    def run_case(name, f, x):
        t = timed_carry(f, x, args.iters)
        print(f"  {name:28s} {1e3 * (t - t0):7.3f} ms", flush=True)

    def consume(y):
        """Fold every C-wide output slice back into carry shape — keeps ALL
        output columns live (a bare y[:, :C] lets XLA dead-code the rest of
        the dot: the first probe run measured qkv at an impossible 790
        TOP/s before this fix)."""
        n = y.shape[1] // C
        acc = y[:, :C]
        for i in range(1, n):
            acc = acc + y[:, i * C : (i + 1) * C]
        return acc

    # --- the int8 qkv dot at both Ms (output folded back to carry shape)
    def qkv_win(x):
        y = F.linear(qkv_p, x.reshape(NW * L, C))
        return consume(y).reshape(NW, ws, ws, C)

    run_case("qkv int8-static M=4900", qkv_win, xw)

    def qkv_flat(x):
        y = F.linear(qkv_p, x.reshape(-1, C))
        return consume(y).reshape(x.shape)

    run_case("qkv int8-static M=4096", qkv_flat,
             xflat.reshape(64, 64, C))

    # bf16 dense same shape for the ratio
    wqkv = {"w": jax.random.normal(jax.random.PRNGKey(3), (C, 3 * C),
                                   jnp.bfloat16) * 0.02}
    run_case("qkv bf16 dense M=4900",
             lambda x: consume(F.linear(wqkv, x.reshape(NW * L, C)))
             .reshape(NW, ws, ws, C), xw)

    # --- proj int8 (static) and int8-pre at the windowed M
    def proj_static(x):
        y = F.linear(proj_p, x.reshape(NW * L, C))
        return y.reshape(NW, ws, ws, C)

    run_case("proj int8-static M=4900", proj_static, xw)

    def proj_pre(x):
        xi = jnp.clip(jnp.round(x.astype(jnp.float32) * 16.0), -127, 127
                      ).astype(jnp.int8)
        y = F.linear(proj_p, xi.reshape(NW * L, C))
        return y.reshape(NW, ws, ws, C).astype(jnp.bfloat16)

    run_case("proj int8-PRE M=4900 (+quant outside)", proj_pre, xw)

    # --- MLP lin1 (the efficient comparison point), M=4096
    def lin1_flat(x):
        y = F.linear(mlp1, x.reshape(-1, C))
        return consume(y).reshape(x.shape)

    run_case("lin1 int8-static M=4096", lin1_flat, xflat.reshape(64, 64, C))

    def lin1_win(x):
        y = F.linear(mlp1, x.reshape(NW * L, C))
        return consume(y).reshape(NW, ws, ws, C)

    run_case("lin1 int8-static M=4900", lin1_win, xw)

    # --- rel-pos tile einsums alone
    Rh = ie.get_rel_pos(ws, ws, bp["attn"]["rel_pos_h"]).astype(jnp.bfloat16)
    Rw = ie.get_rel_pos(ws, ws, bp["attn"]["rel_pos_w"]).astype(jnp.bfloat16)

    def rel_only(x):
        qg = x.reshape(NW, ws, ws, nh, hd)
        rel_h = jnp.einsum("bhwnc,hkc->bnhwk", qg, Rh)
        rel_w = jnp.einsum("bhwnc,wkc->bnhwk", qg, Rw)
        rel = jnp.concatenate([rel_h, rel_w], -1)
        return x + jnp.mean(rel).astype(x.dtype)

    run_case("rel einsums (on x as q)", rel_only, xw)

    # --- partition/unpartition round trip on bf16 vs int8 bytes
    x_grid = jax.random.normal(jax.random.PRNGKey(2), (1, G, G, C),
                               jnp.bfloat16)

    def part_roundtrip(x):
        yw, pad_hw = ie.window_partition(x, ws)
        return ie.window_unpartition(yw, ws, pad_hw, (G, G))

    tg = timed_carry(part_roundtrip, x_grid, args.iters)
    t0g = timed_carry(lambda x: x * jnp.bfloat16(1.01), x_grid, args.iters)
    print(f"  {'partition round trip bf16':28s} {1e3 * (tg - t0g):7.3f} ms",
          flush=True)

    # --- full attention stage (the anatomy's attn(flash) reference point)
    def attn_full(x):
        yw = ie.attention(sp["attn"], x, ecfg, NULL_CTX, "attn", "flash")
        return yw

    run_case("FULL attn (qkv+rel+flash+proj)", attn_full, xw)


if __name__ == "__main__":
    main()
