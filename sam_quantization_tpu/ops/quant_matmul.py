"""Fused dequantize + matmul for packed low-bit weights.

TPU-native counterpart of the reference's Triton ``matmul4_kernel``
(gptq_triton/quant_linear.py:122-352): unpack the packed integer weights,
dequantize with per-group scales/zeros, and feed the MXU — all inside one
Pallas kernel so the packed weights are read from HBM exactly once at
``bits/16`` the bandwidth of a bf16 matmul.

Design differences from the Triton kernel (deliberate, TPU-first):
  * block-planar packing (see ``nn/packed.py``) so unpack is shift+mask into
    contiguous sublane tiles — no per-lane shifter table;
  * fp32 accumulation in VMEM scratch across a sequential K grid, with the
    MXU consuming bf16 dequantized tiles;
  * output allocated by XLA (the Triton version writes into a process-global
    20 MiB workspace buffer, quant_linear.py:13,401-431 — an aliasing hazard
    we do not replicate);
  * no NO_GROUPS specialization needed: ungrouped layers simply have one
    scale group and the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sam_quantization_tpu.nn.packed import (
    IntLinear,
    PackedLinear,
    dequantize,
    unpack_to_int,
    unpack_words,
)


INTERPRET = False  # set True to run kernels in interpreter mode (CPU tests)


def _use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def quant_matmul(x: jax.Array, p: PackedLinear, *, backend: str | None = None) -> jax.Array:
    """``x (M, K) @ dequant(p) (K, N) -> (M, N)`` in x.dtype.

    backend: "pallas" | "xla" | None (auto: pallas on TPU).
    """
    if backend is None:
        backend = "pallas" if _use_pallas() else "xla"
    if backend == "pallas" and not kernel_supported(x, p):
        backend = "xla"
    if backend == "xla":
        if p.act_bits == 8:
            return quant_matmul_a8_xla(x, p)
        return quant_matmul_xla(x, p)
    if p.act_bits == 8:
        if p.sym and p.num_groups <= 4:
            # XLA's native int8 MXU mode beats the in-kernel integer dots
            # (Mosaic's int8 dot doesn't hit the double-rate path). The
            # grouped variant materializes a (G, M, N) int32 accumulator, so
            # only small group counts route here.
            return quant_matmul_a8_sym_native(x, p)
        return quant_matmul_a8_pallas(x, p)
    return quant_matmul_pallas(x, p)


def quantize_activations_int8(x: jax.Array):
    """Dynamic symmetric per-token int8 quantization: (xq int8, scale (M, 1))."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    # (M, 1) reciprocal + broadcast multiply instead of an (M, K) divide
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / scale)), -127, 127).astype(jnp.int8)
    return xq, scale


def quant_matmul_a8_xla(x: jax.Array, p: PackedLinear) -> jax.Array:
    """W4A8 reference path: simulate the int8-activation kernel in XLA."""
    xq, xs = quantize_activations_int8(x)
    w = dequantize(p, jnp.float32)
    y = jnp.dot(xq.astype(jnp.float32), w, preferred_element_type=jnp.float32)
    return (y * xs).astype(x.dtype)


def quant_matmul_a8_sym_native(x: jax.Array, p: PackedLinear) -> jax.Array:
    """Symmetric W-A8 through XLA's *native* int8 MXU mode.

    XLA lowers int8×int8→int32 dots onto the double-rate int8 systolic path
    (measured 1.49× bf16 on v5e); the weight unpack materializes an int8
    tensor per call but that read/write is half a bf16 weight load. Grouped
    scales fold per K-group via a reshaped contraction.
    """
    assert p.sym
    xq, xs = quantize_activations_int8(x)
    mid = 1 << (p.bits - 1)
    w8 = (unpack_to_int(p) - mid).astype(jnp.int8)  # (K, N)
    K, N = w8.shape
    G = p.scales.shape[0]
    if G == 1:
        acc = jax.lax.dot_general(
            xq, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        y = acc * p.scales[0][None, :]
    else:
        g = K // G
        acc = jax.lax.dot_general(
            xq.reshape(-1, G, g),
            w8.reshape(G, g, N),
            dimension_numbers=(((2,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.int32,
        )  # (G, M, N)
        y = jnp.einsum("gmn,gn->mn", acc.astype(jnp.float32), p.scales)
    return (y * xs).astype(x.dtype)


def int8_matmul(x: jax.Array, p: IntLinear) -> jax.Array:
    """Cached-int8 native path: int8 activations × stored int8 weights on the
    double-rate MXU — no unpack in the hot loop.

    With a calibrated ``in_scale`` the activation quantization is a static
    elementwise op (round/clip at a fixed scale) that XLA fuses into the
    producer — no per-token amax reduction, the cost that capped the dynamic
    A8 path at 0.98x bf16 (BENCHMARKS.md r1).

    An int8 ``x`` is taken as ALREADY quantized at ``in_scale`` (int8-pre):
    the flash attention kernel's int8-out epilogue feeds attn.proj this way
    (ops/flash_attention.flash_attention_qkv_packed out_inv_scale). The
    original activation dtype is unrecoverable from an int8 input, so this
    branch emits bf16 — callers engage the epilogue only in bf16 pipelines
    (models/image_encoder.attention gates on the activation dtype)."""
    # nk layout: w8 is (N, K); contract x's K against w8's LAST dim. Same
    # math, physically-minor contraction dim — the measured-faster int8 dot
    # (IntLinear.layout).
    wdims = ((1,), (1,)) if p.layout == "nk" else ((1,), (0,))
    if x.dtype == jnp.int8:
        assert p.in_scale is not None, "pre-quantized input needs in_scale"
        acc = jax.lax.dot_general(
            x, p.w8, (wdims, ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        G = p.scales.shape[0]
        assert G == 1, "int8-pre path is per-channel (single group)"
        return (acc * (p.scales[0] * p.in_scale)[None, :]).astype(jnp.bfloat16)
    if p.in_scale is not None:
        # Multiply by the reciprocal instead of dividing: the divide runs
        # per element inside the hot loop while 1/scale is loop-invariant
        # (XLA hoists it). Measured 0.06 ms/block on the ViT-H MLP chain.
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (1.0 / p.in_scale)), -127, 127
        ).astype(jnp.int8)
        xs = p.in_scale
    else:
        xq, xs = quantize_activations_int8(x)
    K, N = p.in_features, p.out_features
    G = p.scales.shape[0]
    if G == 1:
        acc = jax.lax.dot_general(
            xq, p.w8, (wdims, ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        if p.in_scale is not None:
            # Fold the static activation scale into the per-column dequant
            # vector: one fused multiply in the dot's epilogue.
            return (acc * (p.scales[0] * xs)[None, :]).astype(x.dtype)
        y = acc * p.scales[0][None, :]
    else:
        assert p.layout == "kn", "grouped int8 path requires the kn layout"
        g = K // G
        acc = jax.lax.dot_general(
            xq.reshape(-1, G, g),
            p.w8.reshape(G, g, N),
            dimension_numbers=(((2,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.int32,
        )
        y = jnp.einsum("gmn,gn->mn", acc.astype(jnp.float32), p.scales)
    return (y * xs).astype(x.dtype)


def kernel_supported(x: jax.Array, p: PackedLinear) -> bool:
    """Shapes the fused kernel handles; others fall back to the XLA path."""
    M, K = x.shape
    N = p.out_features
    return N % 128 == 0 and K % p.pack_block == 0 and _divisor_block(N) is not None


def _divisor_block(N: int):
    for c in (512, 256, 128):
        if N % c == 0:
            return c
    return None


def quant_matmul_xla(x: jax.Array, p: PackedLinear) -> jax.Array:
    """Reference path: dequantize to bf16/f32 then a plain XLA matmul."""
    w = dequantize(p, x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _dequant_tile(qw, scales, zeros, bits, pack_block, compute_dtype, qw_hi=None):
    """Unpack + dequantize one (BKp, BN) packed tile → (BK, BN) compute tile."""
    if bits == 3:
        w_int = unpack_words(qw, 2, pack_block) | (
            unpack_words(qw_hi, 1, pack_block) << 2
        )
    else:
        w_int = unpack_words(qw, bits, pack_block)  # (BK, BN) int32
    BK, BN = w_int.shape
    G = scales.shape[0]
    wf = w_int.astype(jnp.float32)
    wg = wf.reshape(G, BK // G, BN)
    w = (wg - zeros[:, None, :]) * scales[:, None, :]
    return w.reshape(BK, BN).astype(compute_dtype)


def _qmm_kernel(
    x_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref, *, bits, pack_block, groups_per_bk
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # scales/zeros arrive as (1, groups_per_bk, BN) blocks of a
    # (num_k_tiles, groups_per_bk, N) array — the leading axis is the K grid,
    # so no sublane-dynamic slicing is needed (Mosaic can't prove alignment
    # for thin row slices).
    w = _dequant_tile(qw_ref[:], s_ref[0], z_ref[0], bits, pack_block, x_ref.dtype)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _qmm_kernel3(
    x_ref, qw_ref, qwhi_ref, s_ref, z_ref, o_ref, acc_ref, *, pack_block,
    groups_per_bk,
):
    """bits=3 variant: split-plane weights (2-bit plane + 1-bit plane)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _dequant_tile(
        qw_ref[:], s_ref[0], z_ref[0], 3, pack_block, x_ref.dtype, qwhi_ref[:]
    )
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# W-low-bit / A-int8 kernel: integer dots on the int8 MXU (2x bf16 peak on
# v5e). Per K-tile and scale group g:
#     acc += s_g * (xq @ q_g - z_g * rowsum(xq_g))
# and the per-token activation scale multiplies once at the end. This is the
# path that actually beats bf16 in the compute-bound regime — the reference's
# Triton kernel only saves weight bandwidth (quant_linear.py:122-352).
# ---------------------------------------------------------------------------


def _qmm_a8_kernel(
    x_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref,
    *, bits, pack_block, groups_per_bk,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w_int = unpack_words(qw_ref[:], bits, pack_block)  # (BK, BN) int32
    BK, BN = w_int.shape
    gs = BK // groups_per_bk
    xq = x_ref[:]  # (BM, BK) int8
    scales = s_ref[0]  # (groups_per_bk, BN) f32
    zeros = z_ref[0]
    # Grid values span [0, 2^bits). For bits=8 that exceeds int8; shift the
    # grid down by 128 and fold the shift into the zero-point correction
    # (xq @ (w-128) - (z-128)·rowsum == xq @ w - z·rowsum).
    off = 128 if bits == 8 else 0
    w8 = (w_int - off).astype(jnp.int8)
    zeros = zeros - off
    acc = acc_ref[:]
    for g in range(groups_per_bk):
        xg = xq[:, g * gs : (g + 1) * gs]
        wg = w8[g * gs : (g + 1) * gs, :]
        d = jax.lax.dot_general(
            xg, wg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        rs = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
        acc = acc + (d - zeros[g][None, :] * rs) * scales[g][None, :]
    acc_ref[:] = acc

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits", "groupsize", "pack_block", "block_m", "block_n", "block_k", "interpret"
    ),
)
def _qmm_a8_call(
    xq, qweight, scales, zeros,
    *, bits, groupsize, pack_block, block_m, block_n, block_k, interpret=False,
):
    M, K = xq.shape
    N = qweight.shape[1]
    per = 32 // bits
    grid = (pl.cdiv(M, block_m), pl.cdiv(N, block_n), K // block_k)
    groups_per_bk = max(block_k // groupsize, 1)
    kernel = functools.partial(
        _qmm_a8_kernel, bits=bits, pack_block=pack_block, groups_per_bk=groups_per_bk
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k // per, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, scales.shape[1], block_n), lambda i, j, k: (k, 0, j)),
            pl.BlockSpec((1, zeros.shape[1], block_n), lambda i, j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + (K // per) * N * 4 + M * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, qweight, scales, zeros)


# ---------------------------------------------------------------------------
# Symmetric pure-integer fast path: with a symmetric grid (zero == mid-point)
# the kernel is one int8 dot per K-tile with int32 accumulation in VMEM —
# no per-group float math inside the loop, the int8 MXU runs at ~1.5x bf16
# throughput (measured on v5e). Grouped scales are folded in per K-tile.
# ---------------------------------------------------------------------------


def _qmm_a8_sym_kernel(
    x_ref, qw_ref, s_ref, o_ref, acc_ref, *, bits, pack_block, groups_per_bk
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mid = 1 << (bits - 1)
    w_int = unpack_words(qw_ref[:], bits, pack_block)
    w8 = (w_int - mid).astype(jnp.int8)  # symmetric grid → integer weights
    if groups_per_bk == 1:
        d = jax.lax.dot_general(
            x_ref[:], w8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc_ref[:] += d.astype(jnp.float32) * s_ref[0][0][None, :]
    else:
        BK = w8.shape[0]
        gs = BK // groups_per_bk
        xq = x_ref[:]
        scales = s_ref[0]
        acc = acc_ref[:]
        for g in range(groups_per_bk):
            d = jax.lax.dot_general(
                xq[:, g * gs : (g + 1) * gs], w8[g * gs : (g + 1) * gs, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = acc + d.astype(jnp.float32) * scales[g][None, :]
        acc_ref[:] = acc

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits", "groupsize", "pack_block", "block_m", "block_n", "block_k", "interpret"
    ),
)
def _qmm_a8_sym_call(
    xq, qweight, scales,
    *, bits, groupsize, pack_block, block_m, block_n, block_k, interpret=False,
):
    M, K = xq.shape
    N = qweight.shape[1]
    per = 32 // bits
    grid = (pl.cdiv(M, block_m), pl.cdiv(N, block_n), K // block_k)
    groups_per_bk = max(block_k // groupsize, 1)
    kernel = functools.partial(
        _qmm_a8_sym_kernel, bits=bits, pack_block=pack_block,
        groups_per_bk=groups_per_bk,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k // per, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, scales.shape[1], block_n), lambda i, j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + (K // per) * N * 4 + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, qweight, scales)


def quant_matmul_a8_pallas(x: jax.Array, p: PackedLinear) -> jax.Array:
    if p.bits == 3:
        # Split-plane 3-bit has no in-kernel A8 variant; the native int8-MXU
        # path (sym) / XLA simulation (asym) unpack via unpack_to_int.
        return quant_matmul_a8_sym_native(x, p) if p.sym else quant_matmul_a8_xla(x, p)
    if p.sym:
        return _quant_matmul_a8_sym(x, p)
    return _quant_matmul_a8_asym(x, p)


def _quant_matmul_a8_sym(x: jax.Array, p: PackedLinear) -> jax.Array:
    M, K = x.shape
    N = p.out_features
    block_m, block_n, block_k = pick_blocks(M, N, K, p.groupsize, p.pack_block, p.bits)
    xq, xs = quantize_activations_int8(x)
    Mp = _round_up(M, block_m)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
    gpb = max(block_k // p.groupsize, 1)
    num_k = K // block_k
    scales = p.scales
    if scales.shape[0] != num_k * gpb:
        scales = jnp.repeat(scales, num_k * gpb // scales.shape[0], axis=0)
    scales = scales.reshape(num_k, gpb, N)
    out = _qmm_a8_sym_call(
        xq, p.qweight, scales,
        bits=p.bits,
        groupsize=min(p.groupsize, block_k),
        pack_block=p.pack_block,
        block_m=block_m,
        block_n=block_n,
        block_k=block_k,
        interpret=INTERPRET,
    )
    return (out[:M] * xs).astype(x.dtype)


def _quant_matmul_a8_asym(x: jax.Array, p: PackedLinear) -> jax.Array:
    M, K = x.shape
    N = p.out_features
    block_m, block_n, block_k = pick_blocks(M, N, K, p.groupsize, p.pack_block, p.bits)
    xq, xs = quantize_activations_int8(x)
    Mp = _round_up(M, block_m)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
    gpb = max(block_k // p.groupsize, 1)
    num_k = K // block_k
    scales, zeros = p.scales, p.zeros
    if scales.shape[0] != num_k * gpb:
        reps = num_k * gpb // scales.shape[0]
        scales = jnp.repeat(scales, reps, axis=0)
        zeros = jnp.repeat(zeros, reps, axis=0)
    scales = scales.reshape(num_k, gpb, N)
    zeros = zeros.reshape(num_k, gpb, N)
    out = _qmm_a8_call(
        xq, p.qweight, scales, zeros,
        bits=p.bits,
        groupsize=min(p.groupsize, block_k),
        pack_block=p.pack_block,
        block_m=block_m,
        block_n=block_n,
        block_k=block_k,
        interpret=INTERPRET,
    )
    # per-token activation scale applied outside the kernel (XLA fuses it
    # into the consumer)
    return (out[:M] * xs).astype(x.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits", "groupsize", "pack_block", "block_m", "block_n", "block_k", "interpret"
    ),
)
def _qmm_call(
    x,
    qweight,
    scales,
    zeros,
    qweight_hi=None,
    *,
    bits,
    groupsize,
    pack_block,
    block_m,
    block_n,
    block_k,
    interpret=False,
):
    M, K = x.shape
    N = qweight.shape[1]
    per = 16 if bits == 3 else 32 // bits
    grid = (pl.cdiv(M, block_m), pl.cdiv(N, block_n), K // block_k)
    groups_per_bk = max(block_k // groupsize, 1)

    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
        pl.BlockSpec((block_k // per, block_n), lambda i, j, k: (k, j)),
    ]
    operands = [x, qweight]
    if bits == 3:
        kernel = functools.partial(
            _qmm_kernel3, pack_block=pack_block, groups_per_bk=groups_per_bk
        )
        in_specs.append(pl.BlockSpec((block_k // 32, block_n), lambda i, j, k: (k, j)))
        operands.append(qweight_hi)
        weight_words = (K // 16 + K // 32) * N
    else:
        kernel = functools.partial(
            _qmm_kernel, bits=bits, pack_block=pack_block, groups_per_bk=groups_per_bk
        )
        weight_words = (K // per) * N
    in_specs += [
        pl.BlockSpec((1, scales.shape[1], block_n), lambda i, j, k: (k, 0, j)),
        pl.BlockSpec((1, zeros.shape[1], block_n), lambda i, j, k: (k, 0, j)),
    ]
    operands += [scales, zeros]
    flops = 2 * M * N * K
    bytes_accessed = M * K * x.dtype.itemsize + weight_words * 4 + M * N * x.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(*operands)


def pick_blocks(M, N, K, groupsize, pack_block, bits=4):
    """Block sizes: tuned-table lookup first (see ops/autotune.py — the
    Triton-autotuner counterpart), else a shape-driven heuristic."""
    from sam_quantization_tpu.ops import autotune

    hit = autotune.lookup(M, K, N, groupsize if groupsize < K else 0, bits)
    if hit is not None:
        return hit
    block_m = min(_round_up(M, 128), 512)
    block_n = _divisor_block(N)
    # K tile: a multiple of both groupsize-alignment and pack block.
    bk = max(groupsize if groupsize < K else pack_block, pack_block)
    while K % bk != 0:
        bk //= 2
    # Grow K tile to reduce grid overhead while staying in VMEM budget.
    while bk * 2 <= min(K, 2048) and K % (bk * 2) == 0:
        bk *= 2
    return block_m, block_n, bk


def quant_matmul_pallas(x: jax.Array, p: PackedLinear) -> jax.Array:
    M, K = x.shape
    N = p.out_features
    block_m, block_n, block_k = pick_blocks(M, N, K, p.groupsize, p.pack_block, p.bits)
    Mp = _round_up(M, block_m)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    # Broadcast per-group scale rows up to one row per K-tile group slot.
    gpb = max(block_k // p.groupsize, 1)
    num_k = K // block_k
    scales, zeros = p.scales, p.zeros
    if scales.shape[0] != num_k * gpb:
        # Ungrouped (or groupsize > block_k): replicate rows so each K-tile
        # sees its (constant) scale row. groupsize % block_k == 0 holds here.
        reps = num_k * gpb // scales.shape[0]
        scales = jnp.repeat(scales, reps, axis=0)
        zeros = jnp.repeat(zeros, reps, axis=0)
    scales = scales.reshape(num_k, gpb, N)
    zeros = zeros.reshape(num_k, gpb, N)
    out = _qmm_call(
        x,
        p.qweight,
        scales,
        zeros,
        p.qweight_hi,
        bits=p.bits,
        groupsize=min(p.groupsize, block_k),
        pack_block=p.pack_block,
        block_m=block_m,
        block_n=block_n,
        block_k=block_k,
        interpret=INTERPRET,
    )
    return out[:M]
