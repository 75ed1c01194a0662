"""Static activation-scale calibration for the int8-MXU serving mode.

Captures each linear layer's input abs-max over calibration batches; the
resulting {path: amax} feeds ``nn.packed.cache_int8(tree, act_scales=...)``
so activation quantization becomes a fixed elementwise op fused into the
producer — the FQ-style static-activation idea (fq_vit layers.py QAct
calibration) applied to the GPTQ/RTN serving path.
"""

from __future__ import annotations

from typing import Dict, Iterable

import jax
import jax.numpy as jnp

from sam_quantization_tpu.models import image_encoder
from sam_quantization_tpu.models.configs import ImageEncoderConfig
from sam_quantization_tpu.nn import functional as F
from sam_quantization_tpu.quant.context import NullCtx


class InputAmaxCtx(NullCtx):
    """Records the abs-max of every linear's input."""

    def __init__(self):
        self.amax: Dict[str, jax.Array] = {}

    def linear(self, path, p, x):
        self.amax[path] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        return F.linear(p, x)


def calibrate_act_scales(
    params,
    ecfg: ImageEncoderConfig,
    batches: Iterable[jax.Array],
    margin: float = 1.0,
) -> Dict[str, float]:
    """{linear path: amax * margin} over the calibration batches."""

    @jax.jit
    def run(params, x):
        ctx = InputAmaxCtx()
        image_encoder.apply(params, x, ecfg, ctx, attn_impl="xla")
        return ctx.amax

    acc: Dict[str, float] = {}
    for x in batches:
        out = run(params, x)
        for k, v in out.items():
            acc[k] = max(acc.get(k, 0.0), float(v))
    return {k: v * margin for k, v in acc.items()}
