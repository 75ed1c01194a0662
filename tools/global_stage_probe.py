"""Time each sub-op of the GLOBAL attention stage in int8 serving mode.

Companion of tools/attn_stage_probe.py for the four L=4096 global blocks
(ViT-H: 2.04 ms/block int8, of which the linears explain only ~0.6 ms).
Pieces: the qkv head-split transpose, the decomposed rel-pos tiles, the
bias3d flash kernel, the head-merge output transpose, and proj.

Run: python tools/global_stage_probe.py [--model vit_h] [--iters 64]
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

    from sam_quantization_tpu.models import image_encoder as ie
    from sam_quantization_tpu.models.configs import CONFIGS
    from sam_quantization_tpu.nn import functional as F
    from sam_quantization_tpu.nn.packed import cache_int8
    from sam_quantization_tpu.ops import flash_attention as fa
    from sam_quantization_tpu.quant import gptq, sequential
    from sam_quantization_tpu.quant.context import NULL_CTX

    ecfg = CONFIGS[args.model].image_encoder
    C, G = ecfg.embed_dim, ecfg.grid_size
    nh, hd = ecfg.num_heads, ecfg.head_dim
    B, L = 1, G * G
    key = jax.random.PRNGKey(0)
    bp = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        ie.init_block(key, ecfg, 0),
    )
    # global blocks have (2*G-1, hd) rel tables
    bp["attn"]["rel_pos_h"] = (
        jax.random.normal(key, (2 * G - 1, hd), jnp.bfloat16) * 0.05
    )
    bp["attn"]["rel_pos_w"] = (
        jax.random.normal(key, (2 * G - 1, hd), jnp.bfloat16) * 0.05
    )
    qcfg = gptq.GPTQConfig(bits=4, groupsize=128, sym=True)
    qbp = sequential.rtn_quantize_encoder({"blocks": [bp]}, qcfg)["blocks"][0]
    sp = cache_int8(
        qbp,
        act_scales={"attn.qkv": 8.0, "attn.proj": 8.0,
                    "mlp.lin1": 8.0, "mlp.lin2": 8.0},
        skip=(),
    )

    xg = jax.random.normal(jax.random.PRNGKey(1), (B, G, G, C), jnp.bfloat16)
    qkv_out = jax.random.normal(jax.random.PRNGKey(2), (B, L, 3 * C),
                                jnp.bfloat16)

    t0 = timed_carry(lambda x: x * jnp.bfloat16(1.01), xg, args.iters)
    t0q = timed_carry(lambda x: x * jnp.bfloat16(1.01), qkv_out, args.iters)
    print(f"[{args.model} global-stage probe] B={B} L={L} nh={nh} hd={hd}")
    print(f"  scan floor (x)           {1e3 * t0:7.3f} ms")
    print(f"  scan floor (qkv)         {1e3 * t0q:7.3f} ms", flush=True)

    def case(name, f, x, floor):
        t = timed_carry(f, x, args.iters)
        print(f"  {name:28s} {1e3 * (t - floor):7.3f} ms", flush=True)

    # head-split transpose alone (consumed via sum back to carry shape)
    def headsplit(x):
        q5 = x.reshape(B, L, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        merged = (q5[0].transpose(0, 2, 1, 3).reshape(B, L, C)
                  + q5[1].transpose(0, 2, 1, 3).reshape(B, L, C))
        return jnp.concatenate(
            [x[:, :, :C] + merged.astype(x.dtype) * jnp.bfloat16(1e-3),
             x[:, :, C:]], axis=-1,
        )

    case("head split+merge transposes", headsplit, qkv_out, t0q)

    # rel tiles at the global shape
    def rel_tiles(x):
        q5 = x.reshape(B, L, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q2 = q5[0].reshape(B * nh, L, hd)
        rel_h, rel_w = ie.decomposed_rel_pos_tiles(
            q2, bp["attn"]["rel_pos_h"], bp["attn"]["rel_pos_w"], (G, G),
            (G, G)
        )
        r = (jnp.sum(rel_h, axis=-1) + jnp.sum(rel_w, axis=-1))  # (B*nh, L)
        return x + jnp.mean(r.reshape(B, nh, L), axis=1)[:, :, None].astype(
            x.dtype) * jnp.bfloat16(1e-3)

    case("headsplit + rel tiles", rel_tiles, qkv_out, t0q)

    # the bias3d kernel alone (pre-split inputs fixed outside the carry)
    q = jax.random.normal(jax.random.PRNGKey(3), (B, nh, L, hd), jnp.bfloat16)
    rh = jax.random.normal(jax.random.PRNGKey(4), (B, nh, L, G),
                           jnp.bfloat16) * 0.05
    rw = jax.random.normal(jax.random.PRNGKey(5), (B, nh, L, G),
                           jnp.bfloat16) * 0.05

    t0h = timed_carry(lambda x: x * jnp.bfloat16(1.01), q, args.iters)

    def kernel_only(x):
        o = fa.flash_attention_relpos(
            x, q, q, rh, rw, scale=hd**-0.5,
        )
        return o

    case("bias3d kernel (bf16 out)", kernel_only, q, t0h)

    def kernel_int8(x):
        o = fa.flash_attention_relpos(
            x, q, q, rh, rw, scale=hd**-0.5,
            out_inv_scale=jnp.float32(16.0),
        )
        return o.astype(jnp.bfloat16) * jnp.bfloat16(1 / 16)

    case("bias3d kernel (int8 out)", kernel_int8, q, t0h)

    def kernel_aug(x, bq):
        # augmented-contraction global form (bias3d=False): bias rides the
        # contraction lanes (Da 80+128 -> 256, 2x q*k MXU) but the per-piece
        # bias VPU loop disappears
        o = fa.flash_attention_relpos(
            x, q, q, rh, rw, scale=hd**-0.5, bias3d=False,
            block_q_override=bq,
        )
        return o

    case("augmented kernel bq=128", lambda x: kernel_aug(x, 128), q, t0h)
    case("augmented kernel bq=256", lambda x: kernel_aug(x, 256), q, t0h)

    def kernel_norel(x):
        # no bias at all — the kernel's floor (dots + softmax only)
        o = fa.flash_attention_relpos(
            x, q, q, None, None, scale=hd**-0.5, kv_size=(G, G),
        )
        return o

    case("no-rel kernel (floor)", kernel_norel, q, t0h)

    # --- experimental kernel variants on the plain (no-rel) form --------
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _k_pair(q_ref, k_ref, v_ref, o_ref, *, halves, clamp):
        """block_q rows split into `halves` independent chains so Mosaic's
        scheduler can overlap one chain's softmax (VPU) with another's dots
        (MXU). `clamp`: replace the row-max subtract with a static cap —
        exact same normalized result unless a row underflows f32."""
        BQ = q_ref.shape[1]
        h = BQ // halves
        outs = []
        for i in range(halves):
            s = jax.lax.dot_general(
                q_ref[0, i * h : (i + 1) * h], k_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if clamp:
                p = jnp.exp2(jnp.minimum(s, 40.0) - 40.0)
            else:
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - m)
            r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                        preferred_element_type=jnp.float32)
            outs.append((o * r).astype(o_ref.dtype))
        for i in range(halves):
            o_ref[0, i * h : (i + 1) * h] = outs[i]

    def make_pair(block_q, halves, clamp):
        BH = B * nh
        Dp = 128

        def f(x):
            qp = jnp.pad(x.reshape(BH, L, hd) * (hd**-0.5 * fa.LOG2E),
                         ((0, 0), (0, 0), (0, Dp - hd)))
            kp = jnp.pad(q.reshape(BH, L, hd), ((0, 0), (0, 0), (0, Dp - hd)))
            vp = jnp.pad(q.reshape(BH, L, hd), ((0, 0), (0, 0), (0, Dp - hd)))
            out = pl.pallas_call(
                partial(_k_pair, halves=halves, clamp=clamp),
                grid=(BH, L // block_q),
                in_specs=[
                    pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0)),
                    pl.BlockSpec((1, L, Dp), lambda b, i: (b, 0, 0)),
                    pl.BlockSpec((1, L, Dp), lambda b, i: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, block_q, Dp),
                                       lambda b, i: (b, i, 0)),
                out_shape=jax.ShapeDtypeStruct((BH, L, Dp), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                ),
            )(qp, kp, vp)
            return out[:, :, :hd].reshape(B, nh, L, hd)

        return f

    for bq, hv, cl in [(256, 1, False), (256, 2, False), (256, 2, True),
                       (512, 4, False), (256, 1, True), (128, 1, True)]:
        case(f"pair bq={bq} halves={hv} clamp={int(cl)}",
             make_pair(bq, hv, cl), q, t0h)

    # --- bisect the production-vs-pair gap -------------------------------
    BH = B * nh

    def prod_fused_prepadded(x):
        # production _fused_attention on the same hand-padded operands the
        # pair kernel gets: isolates kernel-internal differences from the
        # relpos-entry prep (f32 prescale + pads)
        qp = jnp.pad(x.reshape(BH, L, hd) * (hd**-0.5 * fa.LOG2E),
                     ((0, 0), (0, 0), (0, 128 - hd)))
        kp = jnp.pad(q.reshape(BH, L, hd), ((0, 0), (0, 0), (0, 128 - hd)))
        vp = jnp.pad(q.reshape(BH, L, hd), ((0, 0), (0, 0), (0, 128 - hd)))
        out = fa._fused_attention(qp, kp, vp, L=L, bw=1, block_q=256,
                                  interpret=False, exp2=True)
        return out[:, :, :hd].reshape(B, nh, L, hd)

    case("prod _fused_attention prepad", prod_fused_prepadded, q, t0h)

    def make_pair_cost(block_q):
        # the pair kernel plus the production cost_estimate — the only
        # remaining structural difference
        Dp = 128
        flops = 2 * BH * L * L * 2 * Dp

        def f(x):
            qp = jnp.pad(x.reshape(BH, L, hd) * (hd**-0.5 * fa.LOG2E),
                         ((0, 0), (0, 0), (0, Dp - hd)))
            kp = jnp.pad(q.reshape(BH, L, hd), ((0, 0), (0, 0), (0, Dp - hd)))
            vp = jnp.pad(q.reshape(BH, L, hd), ((0, 0), (0, 0), (0, Dp - hd)))
            out = pl.pallas_call(
                partial(_k_pair, halves=1, clamp=False),
                grid=(BH, L // block_q),
                in_specs=[
                    pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0)),
                    pl.BlockSpec((1, L, Dp), lambda b, i: (b, 0, 0)),
                    pl.BlockSpec((1, L, Dp), lambda b, i: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, block_q, Dp),
                                       lambda b, i: (b, i, 0)),
                out_shape=jax.ShapeDtypeStruct((BH, L, Dp), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                ),
                cost_estimate=pl.CostEstimate(
                    flops=flops,
                    bytes_accessed=BH * L * 4 * Dp * 2,
                    transcendentals=BH * L * L,
                ),
            )(qp, kp, vp)
            return out[:, :, :hd].reshape(B, nh, L, hd)

        return f

    case("pair bq=256 + cost_estimate", make_pair_cost(256), q, t0h)

    def bias3d_padded(x):
        # the SAME production bias3d kernel, inputs pre-padded to 128 lanes
        # — isolates the unpadded-trailing-dim cost
        Dp = 128
        qp = jnp.pad(x.reshape(BH, L, hd) * (hd**-0.5 * fa.LOG2E),
                     ((0, 0), (0, 0), (0, Dp - hd)))
        kp = jnp.pad(q.reshape(BH, L, hd), ((0, 0), (0, 0), (0, Dp - hd)))
        vp = jnp.pad(q.reshape(BH, L, hd), ((0, 0), (0, 0), (0, Dp - hd)))
        out = fa._fused_attention_bias3d(
            qp, kp, vp,
            (rh.reshape(BH, L, G).astype(jnp.float32) * fa.LOG2E
             ).astype(jnp.bfloat16),
            (rw.reshape(BH, L, G).astype(jnp.float32) * fa.LOG2E
             ).astype(jnp.bfloat16),
            None, kh=G, kw=G, block_q=128, interpret=False, exp2=True,
        )
        return out[:, :, :hd].reshape(B, nh, L, hd)

    case("bias3d kernel PADDED inputs", bias3d_padded, q, t0h)

    def _k_pair_bias(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                     halves, clamp, kh, kw):
        BQ = q_ref.shape[1]
        hh = BQ // halves
        outs = []
        per = 128 // kw
        for i in range(halves):
            s = jax.lax.dot_general(
                q_ref[0, i * hh : (i + 1) * hh], k_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            Lk = s.shape[1]
            rhh = rh_ref[0, i * hh : (i + 1) * hh].astype(jnp.float32)
            rww = rw_ref[0, i * hh : (i + 1) * hh].astype(jnp.float32)
            rw128 = jnp.concatenate([rww[:, :kw]] * per, axis=-1)
            hsel = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // kw
            pieces = []
            for j in range(Lk // 128):
                bias = rw128
                for t in range(per):
                    bias = bias + jnp.where(
                        hsel == t, rhh[:, j * per + t][:, None], 0.0
                    )
                pieces.append(s[:, j * 128 : (j + 1) * 128] + bias)
            s = jnp.concatenate(pieces, axis=-1)
            if clamp:
                p = jnp.exp2(jnp.minimum(s, 40.0) - 40.0)
            else:
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - m)
            r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                        preferred_element_type=jnp.float32)
            outs.append((o * r).astype(o_ref.dtype))
        for i in range(halves):
            o_ref[0, i * hh : (i + 1) * hh] = outs[i]

    def make_pair_bias(block_q, halves, clamp):
        Dp = 128

        def f(x):
            qp = jnp.pad(x.reshape(BH, L, hd) * (hd**-0.5 * fa.LOG2E),
                         ((0, 0), (0, 0), (0, Dp - hd)))
            kp = jnp.pad(q.reshape(BH, L, hd), ((0, 0), (0, 0), (0, Dp - hd)))
            vp = jnp.pad(q.reshape(BH, L, hd), ((0, 0), (0, 0), (0, Dp - hd)))
            out = pl.pallas_call(
                partial(_k_pair_bias, halves=halves, clamp=clamp, kh=G,
                        kw=G),
                grid=(BH, L // block_q),
                in_specs=[
                    pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0)),
                    pl.BlockSpec((1, L, Dp), lambda b, i: (b, 0, 0)),
                    pl.BlockSpec((1, L, Dp), lambda b, i: (b, 0, 0)),
                    pl.BlockSpec((1, block_q, G), lambda b, i: (b, i, 0)),
                    pl.BlockSpec((1, block_q, G), lambda b, i: (b, i, 0)),
                ],
                out_specs=pl.BlockSpec((1, block_q, Dp),
                                       lambda b, i: (b, i, 0)),
                out_shape=jax.ShapeDtypeStruct((BH, L, Dp), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                ),
            )(qp, kp, vp, rh.reshape(BH, L, G), rw.reshape(BH, L, G))
            return out[:, :, :hd].reshape(B, nh, L, hd)

        return f

    for bq, hv, cl in [(256, 2, False), (256, 2, True), (256, 1, True)]:
        case(f"pair+bias bq={bq} hv={hv} cl={int(cl)}",
             make_pair_bias(bq, hv, cl), q, t0h)

    # proj at M=4096
    proj_p = sp["attn"]["proj"]

    def proj_flat(x):
        y = F.linear(proj_p, x.reshape(L, C))
        return y.reshape(B, G, G, C)

    case("proj int8-static M=4096", proj_flat, xg, t0)

    # FULL global attention stage (the in-model call)
    def attn_full(x):
        return ie.attention(sp["attn"], x, ecfg, NULL_CTX, "attn", "flash")

    case("FULL global attn stage", attn_full, xg, t0)


if __name__ == "__main__":
    main()
