"""Fused attention with decomposed relative-position bias (Pallas TPU).

Counterpart of the reference's Triton flash-attention kernel
(gptq_triton/fused_attention.py:159-309), which streams K/V with an online
softmax and indexes two precomputed bias tensors as ``rel_h[m, n // W]`` +
``rel_w[m, n % W]`` per element.

TPU-first redesign, two ideas:

1. **Row-block, not online-softmax.** SAM's sequence lengths are
   structurally bounded (196 tokens per 14×14 window, 4096 for the four
   global blocks — build_sam.py:78), so the whole K/V block fits in VMEM and
   each program computes a full (BQ, L) logit tile, does one exact softmax,
   and hits the MXU twice. No online-softmax state, no rescaling passes.

2. **The bias rides the contraction.** The decomposed bias
   ``bias[m, n] = rel_h[m, n // kw] + rel_w[m, n % kw]`` is a rank-(kh+kw)
   term, so it folds into the q·k dot by augmenting the contraction axis:

       q_aug[m] = [q[m] * scale, rel_h[m, :], rel_w[m, :]]     (hd + kh + kw)
       k_aug[n] = [k[n],        onehot(n // kw), onehot(n % kw)]

   For the windowed blocks hd + kh + kw = 64/80 + 28 ≤ 128 — the bias lives
   entirely in lanes the MXU was already burning as zero padding (head_dim
   pads to 128), so it costs ZERO extra compute or bytes. For the global
   blocks (hd + 128) it still beats the previous three-dot formulation
   (one 256-lane contraction vs 128-lane qk plus two 128-lane one-hot bias
   matmuls). This replaces the Triton kernel's per-element ``//``/``%``
   gather indexing (fused_attention.py:232-239) with pure MXU work.

Windowed attention batches several (window × head) entries per grid cell
(``bw``) so each program has enough MXU work to hide latency; the (L, L)
logits never touch HBM — the reason eager XLA loses at L=4096 and pays
~4 extra HBM passes at L=196.

3. **Read the projection output directly** (windowed path). The qkv
   linear's (NW, L, 3*nh*hd) activation is passed to the kernel three
   times with different BlockSpec index maps — q/k/v of head h are plain
   hd-wide column slices — so the head-split transpose and the padded
   qa/ka/vp staging arrays never exist in HBM; the rel-pos augmentation
   concat happens in VMEM registers (``_attn_kernel_qkv_packed``). The
   kernel's output is already in (NW, L, nh*hd) layout for the proj.
"""

from __future__ import annotations

import functools
import os
import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Softmax as exp2: every kernel computes logits pre-scaled by log2(e) (the
# factor folds into the q scale / rel-pos tiles / mask lane — rank-1 prework
# outside the kernel) and calls exp2 directly, saving one (L, L) VPU
# multiply per head vs exp's internal x*log2e rescale. Same trick as the
# reference Triton kernel's 1.44269504 scaling (fused_attention.py:211-293).
# SAMQ_FLASH_EXP2=0 opts out (then the log2e prescale is skipped and the
# kernels call exp on plain-scaled logits).
#
# NOTE: all SAMQ_FLASH_* / SAMQ_HOIST_* / SAMQ_GLOBAL_* env gates are read
# at TRACE time
# (they become static jit arguments / branch choices). Flipping one
# mid-process does NOT retrace programs that are already jitted and cached
# — e.g. make_per_block_apply's memoized block jits — so an in-process A/B
# that toggles the env var silently compares identical code. Set the gates
# before the first trace (fresh process per arm), or pass the explicit
# function arguments (``bias3d=``, ``bw_override=``, ...) for programmatic
# A/Bs. Same caveat as SAMQ_FLASH_BIAS3D's, which these gates share.
LOG2E = 1.4426950408889634


def _use_exp2() -> bool:
    return os.environ.get("SAMQ_FLASH_EXP2") != "0"


# Clamped softmax: replace the per-row max-subtract with a STATIC shift —
# p = exp2(clip(s, FLOOR, CAP) - CAP). Mathematically identical to the
# max-subtracted softmax after normalization whenever the row's logits lie
# in [FLOOR, CAP] (the subtracted constant cancels in p/sum(p)); the clip
# only engages outside that range. What it buys: the row-max reduction and
# its (L, L) re-streaming subtract disappear, so Mosaic fuses bias-add +
# shift + exp2 into ONE streaming pass over the logits. Measured on v5e
# (tools/global_stage_probe.py, round 4): the L=4096 bias3d global kernel
# drops 1.25 -> 0.91 ms/block (with halves=2), the windowed packed kernel
# also gains (probe table in the commit).
#
# Safety of the constants (exp2 mode; exp mode uses the same values scaled
# by ln 2 so the exponent range is identical):
#   * CAP = 64 post-log2e units = raw logit 44.4. SAM logits are LN-bounded
#     (|q.k|/sqrt(hd) + bias well under 30 on the trained checkpoints);
#     rows above the cap would squash toward uniform — the opt-out is
#     SAMQ_FLASH_CLAMP=0.
#   * FLOOR = -60: p >= 2^(FLOOR-CAP) = 2^-124 for EVERY element — above
#     the f32 subnormal boundary (2^-126), so sum(p) > 0 always and the
#     deferred 1/sum can never produce inf/NaN, for any input. Masked OOB
#     columns (-1e9 lane) floor at 2^-124 instead of 0: relative weight
#     <= 2^(FLOOR - s_max) of any in-range row — noise below bf16
#     resolution. bf16/f32 are floating, so the tiny absolute magnitudes
#     of p lose no RELATIVE precision vs the max-subtracted form.
#   * Known tail risk (reviewed, accepted): a row whose logits ALL sit
#     below the floor (raw q·k+bias < -41.6 for every key — broken
#     activation calibration or far-OOD inputs; unreachable on the
#     validated checkpoints) flattens to near-uniform attention (and its
#     padded-column share shrinks the windowed output by up to Lp/L-1
#     ≈ 12.5%) instead of the row-max form's exact softmax. The f32
#     exponent range admits no static floor that both prevents 1/0 and
#     preserves >124-log2-unit rows; SAMQ_FLASH_CLAMP=0 restores the
#     exact form at the measured ~0.3 ms/block cost.
_CLAMP_CAP2, _CLAMP_FLOOR2 = 64.0, -60.0
_CLAMP_CAPE, _CLAMP_FLOORE = 64.0 / LOG2E, -60.0 / LOG2E


def _use_clamp() -> bool:
    return os.environ.get("SAMQ_FLASH_CLAMP") != "0"


def _scoped_vmem_kib() -> int:
    """SAMQ_SCOPED_VMEM_KIB: the caller raised XLA's scoped-vmem limit for
    its jits (jax.jit(compiler_options={"xla_tpu_scoped_vmem_limit_kib":
    ...}) — see scoped_vmem_compiler_options). Read at trace time."""
    try:
        return int(os.environ.get("SAMQ_SCOPED_VMEM_KIB", "0"))
    except ValueError:
        return 0


def scoped_vmem_compiler_options() -> Optional[dict]:
    """jit compiler_options matching SAMQ_SCOPED_VMEM_KIB, or None.

    Root cause of the round-4 ViT-L Lp=224 compile failure (VERDICT #5):
    the kernel itself fits, but in a composed block program XLA allocates
    the kernel's whole (25, 224, 1024) bf16 output in scoped vmem (10.9 MB)
    on top of the kernel's own footprint, blowing the default 16 MB limit
    by 2.5 MB. v5e has 128 MB of VMEM; raising the scoped limit to 24 MB
    per-compile (a DebugOptions field, forwarded through the axon remote
    helper) compiles and keeps the tight-padding win. Serving entry points
    (bench.py, cli) set the env + pass these options for 1024-wide models.
    """
    kib = _scoped_vmem_kib()
    if not kib:
        return None
    try:
        # TPU-only DebugOptions field: the CPU compiler rejects it with
        # "No such compile option" — a CPU run with the env set (e.g. a
        # correctness drive next to a TPU bench) must not crash.
        if jax.default_backend() != "tpu":
            return None
    except Exception:  # pragma: no cover
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(kib)}


def scoped_jit(f, **kw):
    """``jax.jit`` that pairs every encoder-compiling jit with the run's
    scoped-vmem compiler options.

    The Lp=224 tight padding engages (partly) on SAMQ_SCOPED_VMEM_KIB, so
    ANY jit that can trace the packed flash kernel must compile under the
    matching raised limit — a bare ``jax.jit`` would reintroduce the
    round-4 ViT-L scoped-vmem compile failure. Use this helper instead of
    hand-pairing ``compiler_options=scoped_vmem_compiler_options()`` at
    each site (the omissions were unfindable by grep otherwise)."""
    opts = scoped_vmem_compiler_options()
    if opts:
        merged = dict(kw.pop("compiler_options", None) or {})
        merged.update(opts)
        kw["compiler_options"] = merged
    return jax.jit(f, **kw)


def _psoft(s, exp2: bool, clamp: bool):
    """Unnormalized softmax numerator (p <= 1), max-subtracted or clamped."""
    if clamp:
        cap, floor = (
            (_CLAMP_CAP2, _CLAMP_FLOOR2) if exp2
            else (_CLAMP_CAPE, _CLAMP_FLOORE)
        )
        return _kexp(jnp.clip(s, floor, cap) - cap, exp2)
    m = jnp.max(s, axis=-1, keepdims=True)
    return _kexp(s - m, exp2)


def _env_int(name: str) -> Optional[int]:
    """Parse an integer trace-time env gate, failing loudly on junk."""
    raw = os.environ.get(name)
    if not raw:
        return None
    try:
        return int(raw)
    except ValueError:
        raise ValueError(
            f"{name}={raw!r} is not an integer; unset it or pass a plain "
            f"decimal value (trace-time sweep gate, see module note)."
        ) from None


def _kexp(s, use_exp2: bool):
    """exp(s / log2e) given pre-scaled s when use_exp2, else exp(s)."""
    return jnp.exp2(s) if use_exp2 else jnp.exp(s)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _attn_kernel(qa_ref, ka_ref, v_ref, o_ref, *, L, bw, exp2, clamp=False):
    """``bw`` full (batch*head) attention problems per program.

    qa_ref/ka_ref: (bw, Lp, Da) augmented q/k; v_ref: (bw, Lp, Dp);
    o_ref: (bw, Lp, Dp). The bias is already inside the contraction.
    """
    Lp = qa_ref.shape[1]
    for b in range(bw):
        s = jax.lax.dot_general(
            qa_ref[b],
            ka_ref[b],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Lp, Lp)
        if Lp > L:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
            s = s + jnp.where(col < L, 0.0, NEG_INF)
        p = _psoft(s, exp2, clamp)
        # Normalize AFTER the p·v dot: the divide shrinks from (Lp, Lp)
        # elements to (Lp, Dp) — softmax is ~40% of this kernel's time and
        # the divide is its most expensive VPU op. p ≤ 1 (max subtracted),
        # so the unnormalized bf16 cast loses no range.
        r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(
            p.astype(v_ref.dtype), v_ref[b], preferred_element_type=jnp.float32
        )
        o_ref[b] = (o * r).astype(o_ref.dtype)


def _attn_kernel_qkv_packed(
    q_ref, k_ref, v_ref, rel_ref, *refs, L, bw, nh, hd, kh, kw, scale,
    exp2, out_quant=False, clamp=False, hsplit=1,
):
    """Windowed attention on head-packed q/k/v activations.

    q/k/v refs are (bw, Lp, nh*hd) slices of the qkv projection output —
    heads are NOT split outside; each head's hd-wide column slice is taken
    from the VMEM-resident block in-kernel (Pallas TPU rejects hd-wide
    BlockSpec blocks: the last block dim must be 128-divisible or full).
    The rel-pos augmentation (module docstring, idea 2) happens in VMEM
    registers: qa = [q*scale, rel], ka = [k, onehot selectors from iota].
    No head transpose or padded qa/ka/vp staging arrays ever reach HBM.
    OOB rows (L < Lp) only corrupt their own output rows, which the caller
    slices off; OOB k/v rows are zeroed (a NaN there would poison every
    row through the softmax), and OOB columns are masked to -inf.
    """
    if out_quant:
        ois_ref, o_ref = refs
        out_inv_scale = ois_ref[0]
    else:
        (o_ref,) = refs
        out_inv_scale = None
    Lp = q_ref.shape[1]
    dt = q_ref.dtype  # compute dtype (o_ref may be int8 with out_inv_scale)
    # Batched-head dots are the default: stacking all nh heads into two
    # batched dot_generals + one whole-problem softmax beats the sequential
    # per-head loop by 8% of the ViT-H windowed STAGE (31.17 -> 28.70
    # ms/img, matched on-chip A/B, round 3) — Mosaic schedules the head
    # batch as one unit instead of nh isolated small-dot/softmax pairs.
    # SAMQ_PACKED_BATCHED=0 opts back into the sequential form (trace-time
    # gate, see the env-gate note at the top of this module).
    batched = os.environ.get("SAMQ_PACKED_BATCHED") != "0"
    eh = (
        jax.lax.broadcasted_iota(jnp.int32, (Lp, kh), 0) // kw
        == jax.lax.broadcasted_iota(jnp.int32, (Lp, kh), 1)
    ).astype(dt)
    ew = (
        jax.lax.broadcasted_iota(jnp.int32, (Lp, kw), 0) % kw
        == jax.lax.broadcasted_iota(jnp.int32, (Lp, kw), 1)
    ).astype(dt)
    sel = jnp.concatenate([eh, ew], axis=-1)  # (Lp, kh+kw)
    rowmask = jax.lax.broadcasted_iota(jnp.int32, (Lp, 1), 0) < L
    if Lp > L:
        # Fold the OOB-column -inf mask into the contraction as one more
        # augmentation lane (qa: 1.0, ka: 0 / -1e9 per k-row): lanes
        # hd+kh+kw+1 still pad to 128 in the MXU, so the (Lp, Lp) mask add
        # disappears from the VPU entirely.
        maskcol = jnp.where(rowmask, 0.0, -1e9).astype(dt)
        sel = jnp.concatenate([sel, maskcol], axis=-1)
    one = jnp.ones((Lp, 1), dt)
    for b in range(bw):
        if batched:
            # SAMQ_PACKED_BATCHED=1: stack all heads and run TWO batched
            # dots + ONE whole-problem softmax instead of nh sequential
            # small-dot/softmax pairs — gives Mosaic the full head batch to
            # schedule at once (A/B'd on-chip; see BENCHMARKS.md r3).
            qa_l, ka_l, v_l = [], [], []
            for h in range(nh):
                q = q_ref[b][:, h * hd : (h + 1) * hd]
                k = k_ref[b][:, h * hd : (h + 1) * hd]
                v = v_ref[b][:, h * hd : (h + 1) * hd]
                qs = (q.astype(jnp.float32) * scale).astype(dt)
                if Lp > L:
                    k = jnp.where(rowmask, k, 0)
                    v = jnp.where(rowmask, v, 0)
                    qa_l.append(jnp.concatenate([qs, rel_ref[b, h], one], -1))
                else:
                    qa_l.append(jnp.concatenate([qs, rel_ref[b, h]], -1))
                ka_l.append(jnp.concatenate([k, sel], -1))
                v_l.append(v)
            # ``hsplit`` > 1 slices the head batch into that many
            # INDEPENDENT dot→softmax→dot chains (same idea as the global
            # kernel's ``halves``): the scheduler can overlap one chain's
            # VPU softmax with another's MXU dots.
            hg = nh // hsplit
            o_groups = []
            for g in range(hsplit):
                qa = jnp.stack(qa_l[g * hg : (g + 1) * hg])  # (hg, Lp, Da)
                ka = jnp.stack(ka_l[g * hg : (g + 1) * hg])
                vv = jnp.stack(v_l[g * hg : (g + 1) * hg])  # (hg, Lp, hd)
                s = jax.lax.dot_general(
                    qa, ka,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (hg, Lp, Lp)
                p = _psoft(s, exp2, clamp)
                r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(vv.dtype), vv,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (hg, Lp, hd)
                if out_quant:
                    # int8-out epilogue: the deferred-softmax normalize and
                    # the consumer's static activation quantize fuse into
                    # one VMEM multiply-round — attn.proj receives int8
                    # directly (int8-pre, no standalone quantize in HBM)
                    o = jnp.clip(
                        jnp.round(o * (r * out_inv_scale)), -127, 127
                    ).astype(o_ref.dtype)
                else:
                    o = (o * r).astype(o_ref.dtype)
                o_groups.append(o)
            for h in range(nh):
                o_ref[b, :, h * hd : (h + 1) * hd] = (
                    o_groups[h // hg][h % hg]
                )
            continue
        for h in range(nh):
            q = q_ref[b][:, h * hd : (h + 1) * hd]
            k = k_ref[b][:, h * hd : (h + 1) * hd]
            v = v_ref[b][:, h * hd : (h + 1) * hd]
            qs = (q.astype(jnp.float32) * scale).astype(dt)
            if Lp > L:
                # zero OOB k/v rows (garbage there may be NaN, which the
                # -1e9 mask lane cannot neutralize) and add the mask lane
                k = jnp.where(rowmask, k, 0)
                v = jnp.where(rowmask, v, 0)
                qa = jnp.concatenate([qs, rel_ref[b, h], one], axis=-1)
            else:
                qa = jnp.concatenate([qs, rel_ref[b, h]], axis=-1)
            ka = jnp.concatenate([k, sel], axis=-1)
            s = jax.lax.dot_general(
                qa,
                ka,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Lp, Lp)
            p = _psoft(s, exp2, clamp)
            # normalize after the p·v dot — divide (Lp, hd) not (Lp, Lp)
            r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            if out_quant:
                o = jnp.clip(jnp.round(o * (r * out_inv_scale)), -127, 127)
                o_ref[b, :, h * hd : (h + 1) * hd] = o.astype(o_ref.dtype)
            else:
                o_ref[b, :, h * hd : (h + 1) * hd] = (o * r).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nh", "hd", "L", "kh", "kw", "scale", "bw", "interpret", "exp2",
        "clamp", "hsplit", "lp_align",
    ),
)
def _fused_attention_qkv_packed(
    qkv, rel, out_inv_scale=None, *, nh, hd, L, kh, kw, scale, bw,
    interpret, exp2=False, clamp=False, hsplit=1, lp_align=128,
):
    NW = qkv.shape[0]
    CH = nh * hd
    Lp = _round_up(L, lp_align)
    flops = 2 * NW * nh * Lp * Lp * (hd + kh + kw + hd)
    grid = (NW // bw,)
    # Contiguous thirds of the projection output — cheap copies (no head
    # transpose); each is passed with a full-width block so the per-head
    # slicing happens on VMEM-resident data.
    qf, kf, vf = qkv[:, :, :CH], qkv[:, :, CH : 2 * CH], qkv[:, :, 2 * CH :]
    out_quant = out_inv_scale is not None
    in_specs = [
        pl.BlockSpec((bw, Lp, CH), lambda i: (i, 0, 0)),
        pl.BlockSpec((bw, Lp, CH), lambda i: (i, 0, 0)),
        pl.BlockSpec((bw, Lp, CH), lambda i: (i, 0, 0)),
        pl.BlockSpec((bw, nh, Lp, kh + kw), lambda i: (i, 0, 0, 0)),
    ]
    operands = [qf, kf, vf, rel]
    if out_quant:
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM)
        )
        operands.append(
            jnp.asarray(out_inv_scale, jnp.float32).reshape(1)
        )
    return pl.pallas_call(
        functools.partial(
            _attn_kernel_qkv_packed,
            L=L, bw=bw, nh=nh, hd=hd, kh=kh, kw=kw, scale=scale, exp2=exp2,
            out_quant=out_quant, clamp=clamp, hsplit=hsplit,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bw, Lp, CH), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (NW, Lp, CH), jnp.int8 if out_quant else qkv.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=NW * Lp * CH * 4 * qkv.dtype.itemsize,
            transcendentals=NW * nh * Lp * Lp,
        ),
        interpret=interpret,
    )(*operands)


def flash_attention_qkv_packed(
    qkv: jax.Array,
    rel: Optional[jax.Array],
    scale: float,
    *,
    nh: int,
    hd: int,
    kh: int,
    kw: int,
    interpret: bool = False,
    bw_override: Optional[int] = None,
    out_inv_scale: Optional[jax.Array] = None,
    hsplit_override: Optional[int] = None,
) -> jax.Array:
    """Windowed flash attention on the packed qkv projection output.

    Args:
      qkv: (NW, L, 3*nh*hd) — the qkv linear's output, heads NOT split.
      rel: (NW, nh, L, kh + kw) concatenated rel-pos tiles, or None.
      scale: softmax scale for q.
      out_inv_scale: when set (a static float, 1/act_scale of the consumer),
        the kernel's epilogue quantizes the output to int8 — the consuming
        IntLinear (attn.proj) then runs int8-PRE (no standalone activation
        quantize pass between attention and proj).

    Returns (NW, L, nh*hd) — proj-ready, no head transpose anywhere
    (int8 when ``out_inv_scale`` is set).
    """
    NW, L, _ = qkv.shape
    if rel is None:
        rel = jnp.zeros((NW, nh, L, kh + kw), qkv.dtype)
    exp2 = _use_exp2()
    if exp2:
        # fold log2(e) into the q scale and the rel-pos tiles so the kernel
        # can use raw exp2 (module note above); XLA fuses the rel multiply
        # into its producer.
        scale = scale * LOG2E
        rel = (rel.astype(jnp.float32) * LOG2E).astype(rel.dtype)
    # Row alignment of the padded window length. 32 (the int8 sublane
    # tile, also satisfying bf16's 16 and f32-logits' 8) shrinks ViT's
    # L=196 to Lp=224 instead of 256 — 12.5% fewer q·k rows, softmax
    # elements and p·v rows; measured 0.180 vs 0.201 ms/block at the ViT-H
    # serving shape (round-4 sweep; align 64 ties 128 since it re-rounds
    # 196 to 256). Measured COMPILE matrix (v5e Mosaic): Lp=224 builds at
    # ViT-H (hd=80, nh=16) and ViT-B (hd=64, nh=12) but blows the 16 MB
    # scoped-vmem limit at ViT-L's hd=64 × nh=16 for every clamp/hsplit
    # combination, while Lp=256 compiles and matches ViT-H's speed there
    # (0.157 ms/block) — so the tight padding engages only on the
    # measured-safe shapes. Sweep gate: SAMQ_PACKED_LP.
    # Bound BOTH factors: hd >= 80 alone would let an unmeasured wide model
    # (hd=80+, nh >> 16) take tight padding and hit the same scoped-vmem
    # compile failure ViT-L did (advisor round-4 finding). The measured-safe
    # shapes are ViT-H (hd=80, nh*hd=1280) and ViT-B/tiny (nh*hd <= 768).
    # ViT-L (nh*hd = 1024) additionally takes tight padding when the caller
    # raised XLA's scoped-vmem limit (scoped_vmem_compiler_options — the
    # round-4 failure was XLA putting the kernel output in scoped vmem, not
    # the kernel's own footprint).
    safe_224 = (
        (hd >= 80 and nh * hd <= 1280)
        or nh * hd <= 768
        or (nh * hd <= 1024 and _scoped_vmem_kib() >= 20480)
    )
    lp_align = _env_int("SAMQ_PACKED_LP") or (32 if safe_224 else 128)
    Lp = _round_up(L, lp_align)
    if Lp != L:
        rel = jnp.pad(rel, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))
    # Full-width blocks: ~2.9 MB of IO per window at ViT-H shapes (all nh
    # heads ride in each block); 10 MB budget leaves room for pipelining.
    per_io = Lp * (4 * nh * hd + nh * (kh + kw)) * qkv.dtype.itemsize
    bw_max = max(1, min(64, (10 << 20) // per_io))
    if NW > 64:
        # Multi-image batches (NW = 25*B at ViT-H): bw=2 at NW=100 exceeded
        # Mosaic's 16 MB scoped-vmem limit by 2 MB (measured, batch-4 bench)
        # while the identical per-program shapes compile fine at NW=25 —
        # the scoped accounting grows with the grid, not only the block.
        # Pin the measured-safe bw; SAMQ_PACKED_BW/bw_override still apply.
        bw_max = 1
    bw = max(d for d in range(1, bw_max + 1) if NW % d == 0)
    if bw_override is not None and NW % bw_override == 0:
        bw = bw_override
    env_bw = _env_int("SAMQ_PACKED_BW")  # trace-time gate (see note)
    if env_bw and NW % env_bw == 0:
        if env_bw > bw_max:
            # A stale sweep var must not reintroduce the measured NW>64
            # scoped-vmem compile failure the bw_max pin exists to avoid.
            warnings.warn(
                f"SAMQ_PACKED_BW={env_bw} exceeds the safe bw={bw_max} at "
                f"NW={NW} (Mosaic scoped-vmem limit); clamping.",
                stacklevel=2,
            )
            env_bw = bw_max
        bw = env_bw
    # Head-batch split (the global kernel's `halves` idea applied to the
    # head dim): independent chains per program give the scheduler
    # VPU/MXU overlap. Default 1 unless measured otherwise — sweep with
    # SAMQ_PACKED_HSPLIT / hsplit_override (trace-time gate, see note).
    hsplit = 1
    if (hsplit_override is not None and hsplit_override > 0
            and nh % hsplit_override == 0):
        hsplit = hsplit_override
    env_hs = _env_int("SAMQ_PACKED_HSPLIT")
    if env_hs and env_hs > 0 and nh % env_hs == 0:
        hsplit = env_hs
    out = _fused_attention_qkv_packed(
        qkv, rel, out_inv_scale, nh=nh, hd=hd, L=L, kh=kh, kw=kw,
        scale=scale, bw=bw, interpret=interpret, exp2=exp2,
        clamp=_use_clamp(), hsplit=hsplit, lp_align=lp_align,
    )
    return out[:, :L, :]


def _attn_kernel_rowblock_bias3d(
    q_ref, k_ref, v_ref, rh_ref, rw_ref, *refs, kh, kw, exp2,
    out_quant=False, halves=1, clamp=False,
):
    """Row-block global attention with the bias as a VPU broadcast add.

    The augmented contraction (module docstring, idea 2) is free for the
    windowed blocks but costs kh + kw = 128 extra lanes at the global shape
    (hd 80 → Da 256), doubling the q·k FLOPs. Here the global sequence is
    exactly the (kh, kw) token grid (L == kh*kw, no padding), so
    ``bias[m, n] = rel_h[m, n // kw] + rel_w[m, n % kw]`` needs no
    contraction at all: q·k stays the plain hd-lane dot, and the bias is
    added per 128-lane column block (Mosaic rejects a (BQ, L)→(BQ, kh, kw)
    shape cast, so the kh-broadcast is an iota-select over the 128/kw
    h-values each lane block spans — static slices + VPU only).

    ``halves``: split the q-row block into that many INDEPENDENT chains.
    Each chain's softmax (VPU) has no data dependence on the others' dots
    (MXU), so Mosaic's scheduler can overlap them — the kernel body is no
    longer one serial dot→softmax→dot chain per program. With ``clamp``
    (see _psoft: the row-max pass replaced by a static shift, letting the
    bias-add + exp2 fuse into one streaming pass) the L=4096 ViT-H global
    kernel measures 1.25 → 0.91 ms/block on v5e at block_q=256, halves=2
    (tools/global_stage_probe.py round 4; halves or clamp alone give only
    part of it — 1.23 / 1.02).
    """
    if out_quant:
        ois_ref, o_ref = refs
        out_inv_scale = ois_ref[0]
    else:
        (o_ref,) = refs
        out_inv_scale = None
    BQ = q_ref.shape[1]
    hh = BQ // halves
    per = 128 // kw  # h-values per 128-lane block (kw <= 128, kw | 128)
    hsel = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // kw  # 0..per-1
    outs = []
    for i in range(halves):
        rows = slice(i * hh, (i + 1) * hh)
        s = jax.lax.dot_general(
            q_ref[0, rows],
            k_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (hh, L), L == kh*kw
        L = s.shape[1]
        rh = rh_ref[0, rows].astype(jnp.float32)  # (hh, >=kh)
        rw = rw_ref[0, rows].astype(jnp.float32)  # (hh, >=kw)
        rw128 = jnp.concatenate([rw[:, :kw]] * per, axis=-1)  # (hh, 128)
        pieces = []
        for j in range(L // 128):
            bias = rw128
            for t in range(per):
                bias = bias + jnp.where(
                    hsel == t, rh[:, j * per + t][:, None], 0.0
                )
            pieces.append(s[:, j * 128 : (j + 1) * 128] + bias)
        s = jnp.concatenate(pieces, axis=-1)
        p = _psoft(s, exp2, clamp)
        # normalize after the p·v dot — divide (hh, hd) not (hh, L)
        r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(
            p.astype(v_ref.dtype), v_ref[0],
            preferred_element_type=jnp.float32,
        )
        if out_quant:
            # int8-out epilogue (same fusion as _attn_kernel_qkv_packed):
            # the deferred-softmax normalize and the consumer's static
            # activation quantize are one VMEM multiply-round — attn.proj
            # gets int8-pre.
            outs.append(jnp.clip(
                jnp.round(o * (r * out_inv_scale)), -127, 127
            ).astype(o_ref.dtype))
        else:
            outs.append((o * r).astype(o_ref.dtype))
    for i in range(halves):
        o_ref[0, i * hh : (i + 1) * hh] = outs[i]


@functools.partial(
    jax.jit,
    static_argnames=(
        "kh", "kw", "block_q", "interpret", "exp2", "halves", "clamp",
    ),
)
def _fused_attention_bias3d(
    qs, ks, v, rh, rw, out_inv_scale=None, *, kh, kw, block_q, interpret,
    exp2=False, halves=1, clamp=False,
):
    BH, L, Dp = qs.shape
    flops = 2 * BH * L * L * 2 * Dp
    grid = (BH, L // block_q)
    Db = rh.shape[2]
    out_quant = out_inv_scale is not None
    in_specs = [
        pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, L, Dp), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, L, Dp), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, block_q, Db), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, block_q, Db), lambda b, i: (b, i, 0)),
    ]
    operands = [qs, ks, v, rh, rw]
    if out_quant:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM))
        operands.append(jnp.asarray(out_inv_scale, jnp.float32).reshape(1))
    return pl.pallas_call(
        functools.partial(
            _attn_kernel_rowblock_bias3d, kh=kh, kw=kw, exp2=exp2,
            out_quant=out_quant, halves=halves, clamp=clamp,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (BH, L, Dp), jnp.int8 if out_quant else qs.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=BH * L * 4 * Dp * qs.dtype.itemsize,
            transcendentals=BH * L * L,
        ),
        interpret=interpret,
    )(*operands)


def _attn_kernel_rowblock(qa_ref, ka_ref, v_ref, o_ref, *, L, exp2,
                          clamp=False):
    """One (BQ, L) row block for one (batch*head) — the long-L (global
    attention) shape where a full problem per program would not fit VMEM."""
    s = jax.lax.dot_general(
        qa_ref[0],
        ka_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, Lp)
    if s.shape[1] > L:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
        s = s + jnp.where(col < L, 0.0, NEG_INF)
    p = _psoft(s, exp2, clamp)
    # normalize after the p·v dot — divide (BQ, Dp) not (BQ, Lp)
    r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )
    o_ref[0] = (o * r).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("L", "bw", "block_q", "interpret", "exp2", "clamp"),
)
def _fused_attention(qa, ka, v, *, L, bw, block_q, interpret, exp2=False,
                     clamp=False):
    BH, Lp, Da = qa.shape
    Dp = v.shape[2]
    flops = 2 * BH * Lp * Lp * (Da + Dp)
    if bw > 1:
        grid = (BH // bw,)
        return pl.pallas_call(
            functools.partial(_attn_kernel, L=L, bw=bw, exp2=exp2,
                              clamp=clamp),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bw, Lp, Da), lambda i: (i, 0, 0)),
                pl.BlockSpec((bw, Lp, Da), lambda i: (i, 0, 0)),
                pl.BlockSpec((bw, Lp, Dp), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((bw, Lp, Dp), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BH, Lp, Dp), qa.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=BH * Lp * (2 * Da + 2 * Dp) * qa.dtype.itemsize,
                transcendentals=BH * Lp * Lp,
            ),
            interpret=interpret,
        )(qa, ka, v)
    grid = (BH, Lp // block_q)
    return pl.pallas_call(
        functools.partial(_attn_kernel_rowblock, L=L, exp2=exp2, clamp=clamp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Da), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Lp, Da), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Lp, Dp), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Lp, Dp), qa.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=BH * Lp * (2 * Da + 2 * Dp) * qa.dtype.itemsize,
            transcendentals=BH * Lp * Lp,
        ),
        interpret=interpret,
    )(qa, ka, v)


def _selector_columns(L: int, kh: int, kw: int, dtype) -> jax.Array:
    """(L, kh + kw) one-hot selectors: column block h is onehot(n // kw),
    block w is onehot(n % kw) — the k-side of the augmented contraction."""
    n = jnp.arange(L)
    eh = jax.nn.one_hot(n // kw, kh, dtype=dtype)
    ew = jax.nn.one_hot(n % kw, kw, dtype=dtype)
    return jnp.concatenate([eh, ew], axis=-1)


def flash_attention_relpos(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rel_h: Optional[jax.Array],
    rel_w: Optional[jax.Array],
    scale: float,
    *,
    kv_size: Optional[Tuple[int, int]] = None,
    interpret: bool = False,
    bw_override: Optional[int] = None,
    block_q_override: Optional[int] = None,
    bias3d: Optional[bool] = None,
    out_inv_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Self-attention with decomposed rel-pos bias.

    Args:
      q, k, v: (B, nh, L, hd).
      rel_h: (B, nh, L, kh) bias tile (``q @ Rh^T``) or None.
      rel_w: (B, nh, L, kw) bias tile or None.
      scale: softmax scale applied to logits.
      kv_size: (kh, kw) with kh * kw == L; inferred from rel tiles if given.
      out_inv_scale: 1/act_scale of an int8-pre consumer. Honored by the
        bias3d (global) kernel, which then returns int8; other dispatch
        paths ignore it and return the input dtype — callers must accept
        either (IntLinear handles both).

    Returns (B, nh, L, hd) — int8 iff the epilogue was applied.
    """
    B, nh, L, hd = q.shape
    if rel_h is not None:
        kh, kw = rel_h.shape[-1], rel_w.shape[-1]
    elif kv_size is not None:
        kh, kw = kv_size
    else:
        kh, kw = 0, 0

    BH = B * nh
    Dp = _round_up(hd, 128)
    Lp = _round_up(L, 128)
    Da = _round_up(hd + kh + kw, 128)

    exp2 = _use_exp2()
    eff = scale * LOG2E if exp2 else scale
    qs = (q.astype(jnp.float32) * eff).astype(q.dtype).reshape(BH, L, hd)
    ks = k.reshape(BH, L, hd)
    if exp2 and rel_h is not None:
        # the log2(e) prescale folds into the bias tiles' producer einsum
        rel_h = (rel_h.astype(jnp.float32) * LOG2E).astype(rel_h.dtype)
        rel_w = (rel_w.astype(jnp.float32) * LOG2E).astype(rel_w.dtype)

    # Global-shape default: bias as a VPU select/add per lane block (see
    # _attn_kernel_rowblock_bias3d), q·k back to the plain hd-lane dot.
    # Measured on v5e at the ViT-H global stage *in context* (scanned
    # 4-block program): 12.93 vs 13.63 ms for the augmented contraction —
    # the in-block kernel is MXU-bound enough for the q·k halving to win.
    # (An ISOLATED carried-scan A/B ties at 3.03 ms/block — prep-bound —
    # which is why this is measured in the block stage; BENCHMARKS.md.)
    # Opt out with bias3d=False or SAMQ_FLASH_BIAS3D=0.
    if (
        rel_h is not None
        and L > 512
        and kh * kw == L
        and L == Lp
        and kw <= 128
        and 128 % kw == 0
        and bias3d is not False
        and os.environ.get("SAMQ_FLASH_BIAS3D") != "0"
    ):
        clamp = _use_clamp()
        # Dispatch, measured on v5e at the ViT-H global shape
        # (tools/global_stage_probe.py round 4): with the clamped softmax,
        # 256-row q blocks split into 2 independent halves win (1.25 →
        # 0.91 ms/block — the halves let Mosaic overlap one chain's VPU
        # softmax with the other's MXU dots, and the clamp fuses bias-add
        # + exp2 into one streaming pass). Without clamp (SAMQ_FLASH_CLAMP
        # =0) the round-2/3 sweep result stands: 128-row blocks, one chain
        # (8.16-8.23 vs 8.49-8.66 ms/stage for 256).
        if clamp and Lp % 256 == 0:
            # round-4 sweep (tools/split_sweep.py): bq=256 hv=4 0.844 ms vs
            # hv=2 0.899, bq=512 hv=2/4 0.93/0.92, bq=128 hv=2 0.918
            block_q, halves = 256, 4
        else:
            block_q, halves = min(Lp, 128), 1
        if block_q_override is not None and Lp % block_q_override == 0:
            block_q = block_q_override
        env_bq = _env_int("SAMQ_GLOBAL_BLOCK_Q")  # trace-time gate
        if env_bq and Lp % env_bq == 0:
            block_q = env_bq
        env_hv = _env_int("SAMQ_GLOBAL_HALVES")  # trace-time sweep gate
        if env_hv and env_hv > 0 and block_q % env_hv == 0:
            halves = env_hv
        if halves < 1 or block_q % halves or (block_q // halves) % 8:
            # a non-positive or non-dividing halves would leave the kernel's
            # range(halves) loops empty — o_ref never written, silent garbage
            halves = 1
        # No lane padding: Pallas accepts full-dim trailing blocks (hd=80,
        # kh/kw=64), the MXU pads registers internally, and skipping the
        # pads removes five (BH, L, 128) staging writes per call.
        out = _fused_attention_bias3d(
            qs, ks, v.reshape(BH, L, hd),
            rel_h.reshape(BH, L, kh), rel_w.reshape(BH, L, kw),
            out_inv_scale,
            kh=kh, kw=kw, block_q=block_q, interpret=interpret, exp2=exp2,
            halves=halves, clamp=clamp,
        )
        return out.reshape(B, nh, L, hd)

    if rel_h is not None:
        qa = jnp.concatenate(
            [qs, rel_h.reshape(BH, L, kh), rel_w.reshape(BH, L, kw)], axis=-1
        )
        sel = jnp.broadcast_to(
            _selector_columns(L, kh, kw, k.dtype)[None], (BH, L, kh + kw)
        )
        ka = jnp.concatenate([ks, sel], axis=-1)
    else:
        qa, ka = qs, ks
    qa = jnp.pad(qa, ((0, 0), (0, Lp - L), (0, Da - qa.shape[-1])))
    ka = jnp.pad(ka, ((0, 0), (0, Lp - L), (0, Da - ka.shape[-1])))
    vp = jnp.pad(v.reshape(BH, L, hd), ((0, 0), (0, Lp - L), (0, Dp - hd)))

    # Whole-problem batching for short (windowed) sequences; row blocks for
    # the long global sequence. The kernel loops problems sequentially, so
    # only the per-problem IO blocks scale with bw (one logits scratch at a
    # time); bigger bw = fewer programs = less per-program overhead.
    # Swept on v5e at ViT-H windowed (BH=400): bw 40 → 1.868 ms vs the old
    # capped-8 heuristic's 1.940 (tools/flash_sweep.py).
    if L <= 512:
        per_io = Lp * (2 * Da + 2 * Dp) * 2  # one problem's IO blocks, bytes
        bw_max = max(1, min(64, (10 << 20) // per_io))
        bw = max(d for d in range(1, bw_max + 1) if BH % d == 0)
        block_q = Lp
    else:
        bw = 1
        # block_q must divide Lp (the row grid would silently drop the tail
        # otherwise); Lp is a multiple of 128.
        block_q = 256 if Lp % 256 == 0 else 128
    if bw_override is not None and BH % bw_override == 0:
        bw = bw_override
    if block_q_override is not None and bw == 1 and Lp % block_q_override == 0:
        block_q = block_q_override

    out = _fused_attention(
        qa, ka, vp, L=L, bw=bw, block_q=block_q, interpret=interpret,
        exp2=exp2, clamp=_use_clamp(),
    )
    return out[:, :L, :hd].reshape(B, nh, L, hd)


@functools.lru_cache(maxsize=None)
def _trainable_flash(scale: float, has_rel: bool, interpret: bool):
    """custom_vjp flash attention: Pallas kernel forward, exact eager
    backward (recompute). The kernels have no reverse-mode rule, so
    training pinned eager attention for the whole encoder (trainer.py
    round 3); this gives the forward pass the kernel's speed while the
    backward differentiates :func:`attention_reference` on recomputed
    activations — the grads are exactly the eager function's, the
    standard recompute formulation of flash-attention training. Global
    (L > 512) blocks should stay eager under grad: their backward
    materializes the (nh, L, L) logits either way, so the kernel buys
    nothing and the residual memory doubles."""

    if has_rel:
        @jax.custom_vjp
        def f(q, k, v, rel_h, rel_w):
            return flash_attention_relpos(
                q, k, v, rel_h, rel_w, scale, interpret=interpret
            )

        def fwd(q, k, v, rel_h, rel_w):
            return f(q, k, v, rel_h, rel_w), (q, k, v, rel_h, rel_w)

        def bwd(res, g):
            q, k, v, rel_h, rel_w = res
            _, vjp = jax.vjp(
                lambda *a: attention_reference(*a, scale), q, k, v, rel_h,
                rel_w,
            )
            return vjp(g)

        f.defvjp(fwd, bwd)
        return f

    @jax.custom_vjp
    def fnr(q, k, v):
        return flash_attention_relpos(
            q, k, v, None, None, scale, interpret=interpret
        )

    def fwd_nr(q, k, v):
        return fnr(q, k, v), (q, k, v)

    def bwd_nr(res, g):
        q, k, v = res
        _, vjp = jax.vjp(
            lambda q, k, v: attention_reference(q, k, v, None, None, scale),
            q, k, v,
        )
        return vjp(g)

    fnr.defvjp(fwd_nr, bwd_nr)
    return fnr


def flash_attention_relpos_trainable(
    q, k, v, rel_h, rel_w, scale, *, interpret: bool = False
):
    """Differentiable entry point: kernel forward, eager-recompute vjp."""
    fn = _trainable_flash(float(scale), rel_h is not None, interpret)
    if rel_h is not None:
        return fn(q, k, v, rel_h, rel_w)
    return fn(q, k, v)


def attention_reference(q, k, v, rel_h, rel_w, scale):
    """Eager reference for parity tests (pattern of the reference's own
    kernel self-test, gptq_triton/fused_attention.py:363-418)."""
    B, nh, L, hd = q.shape
    s = jnp.einsum("bnqc,bnkc->bnqk", q * scale, k).astype(jnp.float32)
    if rel_h is not None:
        kh, kw = rel_h.shape[-1], rel_w.shape[-1]
        bias = rel_h[..., :, None] + rel_w[..., None, :]
        s = s + bias.reshape(B, nh, L, L).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bnqk,bnkc->bnqc", p, v)
