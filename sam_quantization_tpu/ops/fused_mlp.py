"""Fused quantized MLP: dequant-lin1 → GELU → dequant-lin2 in one kernel.

Counterpart of the reference's ``gptq_triton/fused_mlp.py`` — which fuses a
*LLaMA-gate* SiLU MLP and is wired to an undefined ``LlamaMLP`` symbol
(fused_mlp.py:17), i.e. latent/broken for SAM (and disabled at
gptq4sam_infer.py:221). This is the working SAM-shaped (GELU) version.

Why fuse: the (M, 4C) hidden activations never touch HBM — for ViT-H that is
2 × 4096 × 5120 × 2B ≈ 84 MB of traffic saved per block. The hidden dim is
tiled sequentially; each step computes a hidden tile on the MXU, applies GELU
on the VPU, and accumulates its contribution to the output in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sam_quantization_tpu.nn.packed import PackedLinear
from sam_quantization_tpu.ops import quant_matmul
from sam_quantization_tpu.ops.quant_matmul import _dequant_tile, _round_up


def _fused_mlp_kernel(
    x_ref, qw1_ref, s1_ref, z1_ref, b1_ref, qw2_ref, s2_ref, z2_ref,
    o_ref, acc_ref, *, bits, pack_block,
):
    h = pl.program_id(1)

    @pl.when(h == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w1 = _dequant_tile(qw1_ref[:], s1_ref[0], z1_ref[0], bits, pack_block, x_ref.dtype)
    a = jnp.dot(x_ref[:], w1, preferred_element_type=jnp.float32)
    a = a + b1_ref[0][None, :]
    # tanh-approx GELU: Mosaic lowers neither erf nor erfc; the approximation
    # error (<3e-3 abs) is far below the INT4 weight-quantization noise
    a = jax.nn.gelu(a, approximate=True).astype(x_ref.dtype)
    w2 = _dequant_tile(qw2_ref[:], s2_ref[0], z2_ref[0], bits, pack_block, x_ref.dtype)
    acc_ref[:] += jnp.dot(a, w2, preferred_element_type=jnp.float32)

    @pl.when(h == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "pack_block", "block_m", "block_h", "interpret"),
)
def _fused_mlp_call(
    x, qw1, s1, z1, b1, qw2, s2, z2,
    *, bits, pack_block, block_m, block_h, interpret=False,
):
    M, K = x.shape
    H = qw1.shape[1]
    N = qw2.shape[1]
    per = 32 // bits
    grid = (pl.cdiv(M, block_m), H // block_h)
    kernel = functools.partial(_fused_mlp_kernel, bits=bits, pack_block=pack_block)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i, h: (i, 0)),
            pl.BlockSpec((K // per, block_h), lambda i, h: (0, h)),
            pl.BlockSpec((1, s1.shape[1], block_h), lambda i, h: (0, 0, h)),
            pl.BlockSpec((1, z1.shape[1], block_h), lambda i, h: (0, 0, h)),
            pl.BlockSpec((1, block_h), lambda i, h: (0, h)),
            pl.BlockSpec((block_h // per, N), lambda i, h: (h, 0)),
            pl.BlockSpec((1, s2.shape[1], N), lambda i, h: (h, 0, 0)),
            pl.BlockSpec((1, z2.shape[1], N), lambda i, h: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, N), lambda i, h: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * M * K * H,
            bytes_accessed=M * K * 2 + (K * H // per) * 8 + M * N * 2,
            transcendentals=M * H,
        ),
        interpret=interpret,
    )(x, qw1, s1, z1, b1, qw2, s2, z2)


def fused_mlp_supported(p1: PackedLinear, p2: PackedLinear) -> bool:
    if not (isinstance(p1, PackedLinear) and isinstance(p2, PackedLinear)):
        return False
    if p1.bits != p2.bits or p1.bits == 3 or p1.act_bits or p2.act_bits:
        # bits=3 (split-plane) runs through the per-layer fused dequant-matmul
        # kernel instead; no 3-bit variant of this fused-MLP kernel yet.
        return False
    H = p1.out_features
    return (
        H == p2.in_features
        and H % 512 == 0
        and p1.in_features % p1.pack_block == 0
        and p2.out_features % 128 == 0
    )


def _scale_tiles(p: PackedLinear, tile: int, axis: str):
    """Reshape (G, N) scales/zeros for grid-blocked kernel access."""
    if axis == "k":  # groups along K, all visible per tile: (1, G, out)
        return p.scales[None], p.zeros[None]
    # axis == "h": groups along the tiled dim → (num_h, gpb, N)
    G = p.scales.shape[0]
    num_h = p.in_features // tile
    gpb = max(G // num_h, 1)
    scales, zeros = p.scales, p.zeros
    if G != num_h * gpb:
        reps = num_h * gpb // G
        scales = jnp.repeat(scales, reps, axis=0)
        zeros = jnp.repeat(zeros, reps, axis=0)
    return (
        scales.reshape(num_h, gpb, p.out_features),
        zeros.reshape(num_h, gpb, p.out_features),
    )


def fused_mlp(x: jax.Array, p1: PackedLinear, p2: PackedLinear) -> jax.Array:
    """``lin2(gelu(lin1(x)))`` with both linears packed. x: (..., K)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    H = p1.out_features
    N = p2.out_features

    use_pallas = (
        quant_matmul._use_pallas() or quant_matmul.INTERPRET
    ) and fused_mlp_supported(p1, p2)
    if not use_pallas:
        h = quant_matmul.quant_matmul(x2, p1)
        if p1.bias is not None:
            h = h + p1.bias.astype(h.dtype)
        from sam_quantization_tpu.nn import functional as F

        h = F.gelu(h)  # erf at f32, tanh approx at bf16 (see F.gelu)
        y = quant_matmul.quant_matmul(h, p2)
        if p2.bias is not None:
            y = y + p2.bias.astype(y.dtype)
        return y.reshape(*lead, N)

    block_m = min(_round_up(M, 128), 256)
    block_h = 512
    Mp = _round_up(M, block_m)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    s1, z1 = _scale_tiles(p1, block_h, "k")
    s2, z2 = _scale_tiles(p2, block_h, "h")
    b1 = (
        p1.bias.astype(jnp.float32)[None]
        if p1.bias is not None
        else jnp.zeros((1, H), jnp.float32)
    )
    out = _fused_mlp_call(
        x2, p1.qweight, s1, z1, b1, p2.qweight, s2, z2,
        bits=p1.bits,
        pack_block=p1.pack_block,
        block_m=block_m,
        block_h=block_h,
        interpret=quant_matmul.INTERPRET,
    )
    out = out[:M]
    if p2.bias is not None:
        out = out + p2.bias.astype(out.dtype)
    return out.reshape(*lead, N)
