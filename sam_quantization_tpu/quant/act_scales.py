"""Static activation-scale calibration for the int8-MXU serving mode.

Captures each linear layer's input abs-max over calibration batches; the
resulting {path: amax} feeds ``nn.packed.cache_int8(tree, act_scales=...)``
so activation quantization becomes a fixed elementwise op fused into the
producer — the FQ-style static-activation idea (fq_vit layers.py QAct
calibration) applied to the GPTQ/RTN serving path.
"""

from __future__ import annotations

import warnings
from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp

from sam_quantization_tpu.models import image_encoder
from sam_quantization_tpu.models.configs import ImageEncoderConfig
from sam_quantization_tpu.nn import functional as F
from sam_quantization_tpu.quant.context import NullCtx


class InputAmaxCtx(NullCtx):
    """Records the abs-max of every linear's input, plus attention-logit
    range stats for the clamped-softmax canary (see
    :func:`check_clamp_window`)."""

    def __init__(self):
        self.amax: Dict[str, jax.Array] = {}
        # path -> (min over rows of the row-max logit, max logit);
        # observed at the eager path's post-bias point (rel_pos_qact) and
        # pre-bias point (qact_attn1) — post-bias wins when present.
        # The cap check wants the POSITIVE max (large-magnitude negative
        # logits clip to the floor, where clamped softmax is already exact
        # to ~2^-124 — abs-max would false-positive on them).
        self.logit_stats: Dict[str, Tuple[jax.Array, jax.Array]] = {}

    def linear(self, path, p, x):
        self.amax[path] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        return F.linear(p, x)

    def act(self, path, x, ln_input=False):
        if path.endswith("rel_pos_qact") or path.endswith("qact_attn1"):
            xf = x.astype(jnp.float32)
            rowmax = jnp.max(xf, axis=-1)
            self.logit_stats[path] = (jnp.min(rowmax), jnp.max(xf))
        return x


def check_clamp_window(
    min_rowmax: float, max_logit: float, warn: bool = True
) -> bool:
    """Canary for the serving kernels' clamped softmax (advisor round-4).

    The flash kernels' static-shift softmax (ops/flash_attention._psoft) is
    exact only while every row's logits stay inside the clamp window
    [floor, cap] (raw units ≈ [-41.6, 44.4]). A checkpoint whose calibration
    data already leaves the window would serve with silently redefined
    softmax semantics — warn at calibration time instead, before serving.
    Returns True when the calibrated ranges are inside the window.
    """
    from sam_quantization_tpu.ops.flash_attention import (
        _CLAMP_CAPE, _CLAMP_FLOORE,
    )

    ok = True
    if min_rowmax < _CLAMP_FLOORE:
        ok = False
        if warn:
            warnings.warn(
                f"attention logits: a row's max logit {min_rowmax:.1f} is "
                f"below the clamped-softmax floor {_CLAMP_FLOORE:.1f} — that "
                f"row would flatten toward uniform under the serving "
                f"kernels. Serve with SAMQ_FLASH_CLAMP=0 or recalibrate.",
                stacklevel=2,
            )
    if max_logit > _CLAMP_CAPE:
        # Only logits ABOVE the cap break exactness (the row's true max is
        # lost to the clip); large-magnitude NEGATIVE logits clip to the
        # floor where the clamped softmax is already exact to ~2^-124.
        ok = False
        if warn:
            warnings.warn(
                f"attention logit max {max_logit:.1f} exceeds the "
                f"clamped-softmax cap {_CLAMP_CAPE:.1f} — out-of-range rows "
                f"squash toward uniform under the serving kernels. Serve "
                f"with SAMQ_FLASH_CLAMP=0 or recalibrate.",
                stacklevel=2,
            )
    return ok


def calibrate_act_scales(
    params,
    ecfg: ImageEncoderConfig,
    batches: Iterable[jax.Array],
    margin: float = 1.0,
    clamp_canary: bool = True,
) -> Dict[str, float]:
    """{linear path: amax * margin} over the calibration batches.

    ``clamp_canary``: also observe the eager attention logits and warn if
    any calibration row leaves the serving kernels' clamp window (a cheap
    pre-serving check that the clamped softmax stays exact on data like
    the calibration set)."""

    @jax.jit
    def run(params, x):
        ctx = InputAmaxCtx()
        image_encoder.apply(params, x, ecfg, ctx, attn_impl="xla")
        return ctx.amax, ctx.logit_stats

    acc: Dict[str, float] = {}
    min_rowmax, max_logit = float("inf"), float("-inf")
    for x in batches:
        out, stats = run(params, x)
        for k, v in out.items():
            acc[k] = max(acc.get(k, 0.0), float(v))
        post = {k: v for k, v in stats.items() if k.endswith("rel_pos_qact")}
        for mn, mx in (post or stats).values():
            min_rowmax = min(min_rowmax, float(mn))
            max_logit = max(max_logit, float(mx))
    if clamp_canary and min_rowmax < float("inf"):
        check_clamp_window(min_rowmax, max_logit)
    return {k: v * margin for k, v in acc.items()}
