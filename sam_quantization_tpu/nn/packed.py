"""Packed low-bit linear-layer parameters, laid out for TPU unpacking.

The reference packs GPTQ weights as ``qweight int32 (K/8, N)`` with the 8
nibbles of each word holding *adjacent* rows of the weight matrix, unpacked on
GPU with a per-lane shifter (``gptq_triton/quant_linear.py:66-116, 337-339``).
That interleaved layout is hostile to the TPU vector unit: unpacking one word
scatters rows into adjacent sublanes, a strided write the VPU can't do.

Here we use a **block-planar** layout: K is split into pack blocks of
``pack_block`` rows; within each block, the ``per = 32 // bits`` values of a
packed word hold rows ``pack_block/per`` apart. Unpacking a block is then
``per`` independent shift+mask ops, each yielding a *contiguous*
(pack_block/per, N) tile, concatenated along sublanes — pure VPU work with no
shuffles, and each K-tile of a Pallas grid unpacks a contiguous row range.

Scales/zeros are per-group along K (group g covers rows
``g*groupsize:(g+1)*groupsize``) and per output channel, matching the
reference's group semantics (``gptq.py:113-124``). ``pack_block`` always
divides ``groupsize`` (or equals it), so group boundaries align with pack
blocks.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def default_pack_block(in_features: int, bits: int) -> int:
    # bits=3 packs as a 2-bit plane + a 1-bit plane (see pack_int_weights);
    # the 1-bit plane's 32 values/word is the binding alignment constraint.
    per = 32 if bits == 3 else 32 // bits
    pb = min(128, in_features)
    while in_features % pb != 0 or pb % per != 0:
        pb //= 2
        if pb < per:
            raise ValueError(f"cannot find pack block for K={in_features}, bits={bits}")
    return pb


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedLinear:
    """Quantized linear parameters: ``y = x @ dequant(qweight) + bias``.

    Attributes:
      qweight: int32 (K // per, N) block-planar packed weights. For bits=3
        this is the low 2-bit plane (K/16, N); the high bit lives in
        ``qweight_hi`` (K/32, N) — together exactly 3 bits/value, the TPU
        answer to the reference's 32→3-in-uint32 row packing
        (quant.py:149-183) whose irregular 10⅔-per-word layout has no
        efficient vector unpack.
      scales: f32 (G, N) per-group, per-output-channel scales.
      zeros: f32 (G, N) zero points on the integer grid (stored as float).
      bias: optional f32 (N,).
      bits: weight bit width (2, 3, 4, or 8).
      groupsize: K rows per scale group (== K when ungrouped).
      pack_block: rows per planar pack block; divides groupsize.
    """

    qweight: jax.Array
    scales: jax.Array
    zeros: jax.Array
    bias: Optional[jax.Array]
    qweight_hi: Optional[jax.Array] = None  # bits=3 only: 1-bit high plane
    bits: int = dataclasses.field(metadata=dict(static=True), default=4)
    in_features: int = dataclasses.field(metadata=dict(static=True), default=0)
    out_features: int = dataclasses.field(metadata=dict(static=True), default=0)
    groupsize: int = dataclasses.field(metadata=dict(static=True), default=0)
    pack_block: int = dataclasses.field(metadata=dict(static=True), default=128)
    # 0 = weight-only (bf16 activations on the MXU); 8 = dynamic per-token
    # int8 activation quantization feeding the int8 MXU path (2x bf16 peak).
    act_bits: int = dataclasses.field(metadata=dict(static=True), default=0)
    # True when the integer grid is symmetric with the mid-point zero
    # ((maxq+1)/2 for every group): enables the pure-integer W-A8 fast path
    # (single int8 dot per K-tile, int32 accumulation, no zero correction).
    sym: bool = dataclasses.field(metadata=dict(static=True), default=False)

    @property
    def values_per_word(self) -> int:
        # bits=3: the low (2-bit) plane's word count defines qweight's shape.
        return 16 if self.bits == 3 else 32 // self.bits

    @property
    def num_groups(self) -> int:
        return self.in_features // self.groupsize


def pack_int_weights(
    int_weight: jax.Array | np.ndarray,
    scales: jax.Array | np.ndarray,
    zeros: jax.Array | np.ndarray,
    bias: Optional[jax.Array],
    bits: int,
    groupsize: int = 0,
    sym: bool = False,
) -> PackedLinear:
    """Pack integer grid weights (K, N), values in [0, 2^bits - 1].

    ``w[k, n] = (int_weight[k, n] - zeros[k // groupsize, n]) * scales[k // groupsize, n]``.
    """
    int_weight = jnp.asarray(int_weight)
    K, N = int_weight.shape
    if bits not in (1, 2, 3, 4, 8):
        raise ValueError(f"packing supports bits in (1, 2, 3, 4, 8); got {bits}")
    g = groupsize if groupsize > 0 else K
    pb = default_pack_block(K, bits)
    if g % pb != 0:
        pb = default_pack_block(g, bits)
    if bits == 3:
        # Split-plane 3-bit: low 2 bits block-planar at 16/word, high bit
        # block-planar at 32/word — exactly 3K/32 words per column, every
        # plane unpackable with the same contiguous shift+mask as 2/4/8-bit.
        packed = _pack_planar(int_weight & 3, 2, pb)
        packed_hi = _pack_planar(int_weight >> 2, 1, pb)
    else:
        packed = _pack_planar(int_weight, bits, pb)
        packed_hi = None
    scales = jnp.asarray(scales, jnp.float32)
    zeros = jnp.asarray(zeros, jnp.float32)
    if scales.ndim == 1:
        scales = scales[None, :]
    if zeros.ndim == 1:
        zeros = zeros[None, :]
    return PackedLinear(
        qweight=packed,
        qweight_hi=packed_hi,
        scales=scales,
        zeros=zeros,
        bias=None if bias is None else jnp.asarray(bias, jnp.float32),
        bits=bits,
        in_features=K,
        out_features=N,
        groupsize=g,
        pack_block=pb,
        sym=sym,
    )


def _pack_planar(int_vals: jax.Array, bits: int, pb: int) -> jax.Array:
    """Block-planar bit-pack (K, N) grid values in [0, 2^bits) → (K//per, N)
    int32 words: within each pack block, word row r of plane s holds original
    in-block row s * rows_per_plane + r."""
    K, N = int_vals.shape
    per = 32 // bits
    rows_per_plane = pb // per
    w = int_vals.astype(jnp.uint32).reshape(K // pb, per, rows_per_plane, N)
    shifts = (jnp.arange(per, dtype=jnp.uint32) * bits).reshape(1, per, 1, 1)
    packed = jnp.sum((w << shifts).astype(jnp.uint32), axis=1, dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(packed, jnp.int32).reshape(K // per, N)


def unpack_words(qwords: jax.Array, bits: int, pack_block: int) -> jax.Array:
    """Unpack block-planar int32 words (R, N) → int32 grid values (R * per, N).

    ``qwords`` must cover whole pack blocks (R divisible by pack_block/per).
    This is the exact op the Pallas kernel runs per K-tile: shift+mask into
    ``per`` contiguous planes, then a reshape-free concatenate along rows.
    """
    per = 32 // bits
    R, N = qwords.shape
    rows_per_plane = pack_block // per
    mask = jnp.uint32((1 << bits) - 1)
    q = jax.lax.bitcast_convert_type(qwords, jnp.uint32)
    qb = q.reshape(R // rows_per_plane, rows_per_plane, N)
    planes = [
        ((qb >> jnp.uint32(s * bits)) & mask).astype(jnp.int32) for s in range(per)
    ]
    out = jnp.concatenate(planes, axis=1)  # (blocks, pack_block, N)
    return out.reshape(R * per, N)


def unpack_to_int(p: PackedLinear) -> jax.Array:
    """Full int32 grid values of shape (K, N)."""
    if p.bits == 3:
        low = unpack_words(p.qweight, 2, p.pack_block)
        hi = unpack_words(p.qweight_hi, 1, p.pack_block)
        return low | (hi << 2)
    return unpack_words(p.qweight, p.bits, p.pack_block)


def dequantize(p: PackedLinear, dtype=jnp.float32) -> jax.Array:
    """Full dequantized (K, N) weight matrix: ``(q - zero) * scale`` per group
    (reference semantics at gptq_triton/quant_linear.py:280-300, minus its
    off-by-one zero-point storage quirk, which we do not replicate)."""
    q = unpack_to_int(p).astype(jnp.float32)
    K, N = q.shape
    g = p.groupsize
    qg = q.reshape(K // g, g, N)
    w = (qg - p.zeros[:, None, :]) * p.scales[:, None, :]
    return w.reshape(K, N).astype(dtype)


def quantize_rtn(
    w: jax.Array,
    bits: int,
    groupsize: int = 0,
    sym: bool = False,
    bias: Optional[jax.Array] = None,
) -> PackedLinear:
    """Round-to-nearest per-group quantization of a (K, N) weight matrix.

    RTN baseline, counterpart of the reference's ``--nearest`` path
    (gptq4sam.py:355-367) and main3.py's per-channel RTN.
    """
    K, N = w.shape
    g = groupsize if groupsize > 0 else K
    g = min(g, K)  # tiny layers: a group never exceeds the K axis
    maxq = (1 << bits) - 1
    wg = w.reshape(K // g, g, N).astype(jnp.float32)
    wmax = jnp.max(wg, axis=1)
    wmin = jnp.min(wg, axis=1)
    if sym:
        m = jnp.maximum(jnp.abs(wmax), jnp.abs(wmin))
        wmax, wmin = m, -m
    wmax = jnp.where(wmax == wmin, wmax + 1e-8, wmax)
    scale = (wmax - wmin) / maxq
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        zero = jnp.round(-wmin / scale)
    q = jnp.clip(jnp.round(wg / scale[:, None, :]) + zero[:, None, :], 0, maxq)
    return pack_int_weights(
        q.reshape(K, N).astype(jnp.int32), scale, zero, bias, bits, g, sym=sym
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class IntLinear:
    """Unpacked integer linear weights for the native int8-MXU path.

    Storage is a plain int8 (K, N) matrix (zero already subtracted for
    symmetric grids) + per-group scales — 2× bf16's weight bytes but with no
    per-call unpack, so XLA feeds the double-rate int8 systolic array
    directly. Produced from a symmetric :class:`PackedLinear` by
    :func:`cache_int8`; the serving trade-off vs packed INT4 is bandwidth
    (4×) against MXU rate (1.5×) — see BENCHMARKS.md.
    """

    w8: jax.Array  # int8, symmetric grid (zero removed); (K, N) or (N, K) per `layout`
    scales: jax.Array  # f32 (G, N)
    bias: Optional[jax.Array]
    # Static (calibrated) activation scale: when set, activations quantize
    # with this fixed per-tensor scale — a pure elementwise op XLA fuses into
    # the producer's epilogue, removing the per-token amax reduction that
    # eats the int8-MXU advantage in the dynamic path (BENCHMARKS.md r1 A8
    # findings). None = dynamic per-token quantization.
    in_scale: Optional[jax.Array] = None
    groupsize: int = dataclasses.field(metadata=dict(static=True), default=0)
    # Physical weight layout: "kn" stores (K, N); "nk" stores the transpose
    # (N, K) and contracts x's K against w8's LAST dim. The nk layout keeps
    # the int8 contraction dim minor in memory — measured faster at every
    # ViT-H serving shape (qkv 1.71x vs 1.58x bf16, lin2 1.74x vs 1.73x,
    # 4096^3 1.61x vs 1.55x; tools/microbench_a8.py int8-preT, round 3).
    # Only the per-channel (G==1) serving grid supports it.
    layout: str = dataclasses.field(metadata=dict(static=True), default="kn")

    @property
    def in_features(self) -> int:
        return self.w8.shape[1] if self.layout == "nk" else self.w8.shape[0]

    @property
    def out_features(self) -> int:
        return self.w8.shape[0] if self.layout == "nk" else self.w8.shape[1]

    @property
    def num_groups(self) -> int:
        return self.scales.shape[0]


def cache_int8(
    tree,
    act_scales: Optional[dict] = None,
    per_channel: bool = True,
    skip: Optional[Iterable[str]] = ("attn.proj",),
    keep_packed: Iterable[str] = (),
    transpose: bool = True,
):
    """Convert every *symmetric* PackedLinear in a pytree to IntLinear
    (pre-unpacked int8 weights for the native int8-MXU serving mode).

    ``act_scales``: optional {layer path: scalar} of calibrated activation
    abs-max scales (see quant.act_scales.calibrate_act_scales). When a layer
    has one, its activations quantize statically — no runtime reduction.

    ``per_channel``: requantize grouped weights onto ONE symmetric int8 grid
    per output column. Per-group scales would force the int8 dot to emit a
    (G, M, N) int32 accumulator (G× the output's HBM traffic — measured 23%
    *slower* than bf16 end-to-end); per-channel collapses it to a single
    MXU int8 dot + column scale. Requant error is bounded by half an int8
    step of the column amax — 1/16 of the int4 grid's own step, so the
    serving numerics are dominated by the original 4-bit quantization.

    ``skip``: layer-path substrings routed to plain dense bf16 instead of
    int8 — per-op routing driven by measurement: at SAM shapes the int8 dot
    wins on qkv/lin1/lin2 (1.2–1.6×) but *loses* on the small square
    attn.proj (0.82×, tools/microbench_a8.py), where the activation
    quantize pass outweighs the dot speedup.

    ``keep_packed``: layer-path substrings left as PackedLinear (not
    converted) so the fused dequant kernels keep handling them. Measured
    (ViT-H, keep_packed=("mlp.",)): the fused Pallas MLP wins in an
    isolated carried scan (0.58 vs 0.66 ms/block, tools/block_anatomy.py)
    but LOSES inside the full scanned block stage (56.2 vs 50.1 ms/img
    windowed — XLA overlaps the IntLinear int8 dots with the surrounding
    ops better than it can around an opaque pallas_call). Default off.

    ``transpose`` (default on): store per-channel int8 weights in the
    ``nk`` layout ((N, K), contraction dim minor) — the measured-faster
    int8 dot layout (matched on-chip A/B at ViT-H serving: 27.04 → 28.22
    img/s, windowed stage 28.19 → 26.89 ms; microbench per-shape wins in
    IntLinear.layout docstring). Per-channel conversions only; grouped
    fallbacks stay ``kn``.
    """
    from sam_quantization_tpu.nn import packed as _p

    def walk(node, path=""):
        if act_scales and path in act_scales:
            # a key landing on ANY real linear is well-formed, even when
            # that layer is routed away from the static-int8 path below —
            # including layers left FP-dense ({'w': ...} dict nodes) by
            # QuantOverrides skip rules, whose inputs the calibration ctx
            # records just the same (quant/act_scales.py InputAmaxCtx).
            if isinstance(node, PackedLinear) or (
                isinstance(node, dict)
                and "w" in node
                and getattr(node["w"], "ndim", 0) == 2
            ):
                matched.add(path)
        if isinstance(node, PackedLinear) and any(
            s in path for s in keep_packed
        ):
            return node
        if (
            isinstance(node, PackedLinear)
            and node.sym
            and skip is not None
            and any(s in path for s in skip)
        ):
            return {
                "w": _p.dequantize(node, jnp.bfloat16),
                **({"b": node.bias} if node.bias is not None else {}),
            }
        if isinstance(node, PackedLinear) and node.sym:
            mid = 1 << (node.bits - 1)
            in_scale = None
            if act_scales is not None and path in act_scales:
                matched.add(path)
                in_scale = jnp.float32(act_scales[path]) / 127.0
            if per_channel and node.scales.shape[0] > 1:
                w = _p.dequantize(node, jnp.float32)  # exact (K, N)
                s_col = jnp.maximum(
                    jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-12
                )
                w8 = (
                    jnp.clip(jnp.round(w / s_col[None, :]), -127, 127)
                    .astype(jnp.int8)
                )
                return IntLinear(
                    w8=w8.T if transpose else w8,
                    scales=s_col[None, :].astype(jnp.float32),
                    bias=node.bias, in_scale=in_scale, groupsize=0,
                    layout="nk" if transpose else "kn",
                )
            w8 = (_p.unpack_to_int(node) - mid).astype(jnp.int8)
            if transpose and node.scales.shape[0] == 1:
                return IntLinear(
                    w8=w8.T, scales=node.scales, bias=node.bias,
                    in_scale=in_scale, groupsize=node.groupsize, layout="nk",
                )
            return IntLinear(
                w8=w8, scales=node.scales, bias=node.bias,
                in_scale=in_scale, groupsize=node.groupsize,
            )
        if isinstance(node, dict):
            return {k: walk(v, f"{path}.{k}" if path else k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f"{path}.{i}") for i, v in enumerate(node)]
        return node

    matched: set = set()
    out = walk(tree)
    if act_scales:
        unmatched = set(act_scales) - matched
        if unmatched:
            # A key that matches no walk path is almost always a bug (e.g.
            # single-block suffixes like 'attn.qkv' passed for a full
            # encoder whose paths are 'blocks.N.attn.qkv') — and the
            # failure mode is SILENT: the static/int8-pre serving path
            # never engages and dynamic quantization runs instead. Use
            # expand_act_scales to broadcast suffixes over a tree.
            raise ValueError(
                f"act_scales keys matched no quantized linear: "
                f"{sorted(unmatched)}"
            )
    return out


def default_serve_skip(embed_dim: int) -> tuple:
    """Measurement-driven per-op routing for the int8 serving mode, in ONE
    place for every call site (cli/infer, demo/server, bench): the
    attn.proj int8 dot wins at 1280-wide ViT-H (matched A/B
    23.63 → 24.04 img/s, and it unlocks the flash int8-out epilogue) but
    loses at ≤768-wide ViT-B/tiny (0.82×, the activation-quantize pass
    outweighs the small square dot — tools/microbench_a8.py). 1024-wide
    ViT-L sits between the measured regimes; it routes proj to int8 only
    once its own microbench A/B wins (tools/microbench_a8.py --dim 1024),
    until then it takes the safe bf16 route."""
    return () if embed_dim >= 1280 else ("attn.proj",)


def expand_act_scales(tree, suffix_scales: dict) -> dict:
    """Broadcast {path-suffix: amax} over a pytree's quantized linears.

    ``{'attn.qkv': 8.0}`` becomes ``{'blocks.0.attn.qkv': 8.0, ...}`` for
    every PackedLinear whose cache_int8 walk path ends with the suffix —
    the ergonomic form for hand-written scales in tests/dryruns, where
    full calibrated tables (quant.act_scales) would be overkill.
    """
    out = {}

    def walk(node, path=""):
        if isinstance(node, PackedLinear):
            for suffix, amax in suffix_scales.items():
                if path == suffix or path.endswith("." + suffix):
                    out[path] = amax
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}.{k}" if path else k)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{path}.{i}")

    walk(tree)
    return out


def with_act_bits(tree, act_bits: int):
    """Return a copy of a parameter pytree with ``act_bits`` set on every
    PackedLinear node (0 = weight-only, 8 = W-low-bit/A-int8 MXU path)."""

    def walk(node):
        if isinstance(node, PackedLinear):
            return dataclasses.replace(node, act_bits=act_bits)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(tree)
