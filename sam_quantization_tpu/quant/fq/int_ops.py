"""Integer LayerNorm (PTF) and Log-Int-Softmax — ENABLED.

The reference ships both mechanisms short-circuited to FP
(fq_vit/models/ptq/layers.py:258 returns before the int path; :379 returns
``F.softmax``). Here the integer paths actually run, reproducing the math of
layers.py:259-303 (QIntLayerNorm) and :337-398 (QIntSoftmax / i-exp from
I-BERT with the FQ-ViT log2 output quantizer).

All "integer" arithmetic is simulated in f32 (values are exact integers well
within f32 range), which XLA fuses into a handful of VPU ops — the TPU-native
execution of integer-only inference semantics.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sam_quantization_tpu.quant.bit_type import BitType
from sam_quantization_tpu.quant.quantizers import log_round


def get_mn(x: jax.Array, bit: int = 8) -> Tuple[jax.Array, jax.Array]:
    """Decompose positive x ≈ M / 2^N with M < 2^bit (layers.py:251-255)."""
    n = jnp.clip(bit - 1 - jnp.floor(jnp.log2(jnp.maximum(x, 1e-30))), 0, 31)
    m = jnp.clip(jnp.floor(x * jnp.exp2(n)), 0, 2**bit - 1)
    return m, n


def int_layer_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    in_scale: jax.Array,
    out_scale: jax.Array,
    in_scale_expand: int = 1,
) -> jax.Array:
    """Integer LayerNorm with PTF channel re-scaling (layers.py:259-303).

    ``in_scale``: per-channel PTF scales of the input quantizer (all
    power-of-two multiples of their minimum); ``out_scale``: output quantizer
    scale (scalar or per-channel).
    """
    xf = x.astype(jnp.float32)
    C = xf.shape[-1]
    in_scale = jnp.broadcast_to(jnp.asarray(in_scale, jnp.float32), (C,))
    if in_scale_expand != 1:
        in_scale = jnp.repeat(in_scale[: C // in_scale_expand], in_scale_expand)
    out_scale = jnp.asarray(out_scale, jnp.float32)

    x_q = jnp.round(xf / in_scale)
    in_scale1 = in_scale.min()
    in_scale_mask = jnp.round(in_scale / in_scale1)  # 2^alpha per channel
    x_q = x_q * in_scale_mask

    mean_x_q = x_q.mean(axis=-1) * in_scale1
    sum_sq = jnp.sum(x_q**2, axis=-1)
    sum_x = jnp.sum(x_q, axis=-1)
    std_x_q = (in_scale1 / C) * jnp.sqrt(jnp.maximum(C * sum_sq - sum_x**2, 1e-12))

    a = (in_scale1 / std_x_q)[..., None] * weight / out_scale
    a_sign = jnp.sign(a)
    m, n = get_mn(jnp.abs(a))
    b = jnp.round(
        (bias - (mean_x_q / std_x_q)[..., None] * weight) / out_scale * jnp.exp2(n)
    )
    x_q = jnp.round((a_sign * m * x_q + b) / jnp.exp2(n))
    return (x_q * out_scale).astype(x.dtype)


def int_softmax_core(
    x: jax.Array, scaling_factor: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """i-exp integer softmax numerator/denominator (layers.py:348-375).

    Polynomial i-exp with coefficients 0.35815147 / 0.96963238 / 1.0,
    x0 = -ln 2, n = 30.
    """
    sf = jnp.asarray(scaling_factor, jnp.float32)

    def int_polynomial(x_int, sf):
        a, b, c = 0.35815147, 0.96963238, 1.0
        b_int = jnp.floor(b / a / sf)
        c_int = jnp.floor(c / a / sf**2)
        z = x_int * (x_int + b_int) + c_int
        return z, a * sf**2

    def int_exp(x_int, sf):
        x0 = -0.6931  # -ln2
        n = 30
        x0_int = jnp.floor(x0 / sf)
        x_int = jnp.maximum(x_int, n * x0_int)
        q = jnp.floor(x_int / x0_int)
        r = x_int - x0_int * q
        exp_int, exp_sf = int_polynomial(r, sf)
        exp_int = jnp.maximum(jnp.floor(exp_int * jnp.exp2(n - q)), 0.0)
        return exp_int, exp_sf / 2**n

    x_int = x.astype(jnp.float32) / sf
    x_int = x_int - jnp.max(x_int, axis=-1, keepdims=True)
    exp_int, _ = int_exp(x_int, sf)
    exp_int_sum = jnp.sum(exp_int, axis=-1, keepdims=True)
    return exp_int, exp_int_sum


def log_int_softmax(x: jax.Array, scaling_factor, bt: BitType) -> jax.Array:
    """Full LIS: i-exp softmax + log2 output quantization (layers.py:377-390).

    ``softmax ≈ 2^{-round(log2(sum/exp))}``, stored in ``bt.bits`` bits, with
    overflow (ratio too large) flushed to exactly 0.
    """
    exp_int, exp_int_sum = int_softmax_core(x, scaling_factor)
    ratio = jnp.round(exp_int_sum / jnp.maximum(exp_int, 1.0))
    rounds = log_round(ratio)
    mask = rounds >= 2**bt.bits
    qlog = jnp.clip(rounds, 0, 2**bt.bits - 1)
    out = jnp.exp2(-qlog)
    return jnp.where(mask, 0.0, out).astype(x.dtype)
