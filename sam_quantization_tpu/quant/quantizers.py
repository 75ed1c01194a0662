"""Uniform and log2 fake-quantizers (counterparts of
fq_vit/models/ptq/quantizer/{uniform,log2}.py), as pure functions."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sam_quantization_tpu.quant.bit_type import BitType


def uniform_quant(x: jax.Array, scale, zero, bt: BitType) -> jax.Array:
    """``round(x / s + z).clamp(qmin, qmax)`` (uniform.py:23-34)."""
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale + zero), bt.lower_bound, bt.upper_bound
    )


def uniform_dequant(q: jax.Array, scale, zero) -> jax.Array:
    return (q - zero) * scale


def uniform_fake_quant(x: jax.Array, scale, zero, bt: BitType) -> jax.Array:
    """quant→dequant round trip, output in x.dtype."""
    return uniform_dequant(uniform_quant(x, scale, zero, bt), scale, zero).astype(
        x.dtype
    )


def log2_fake_quant(x: jax.Array, bt: BitType) -> jax.Array:
    """Log2 quantization for softmax outputs in [0, 1] (log2.py:18-27):
    ``q = round(-log2 x)``; values with q ≥ 2^bits flush to exactly 0."""
    xf = x.astype(jnp.float32)
    rounds = jnp.round(-jnp.log2(jnp.maximum(xf, 1e-30)))
    mask = rounds >= 2**bt.bits
    q = jnp.clip(rounds, 0, 2**bt.bits - 1)
    out = jnp.exp2(-q)
    return jnp.where(mask, 0.0, out).astype(x.dtype)


def log_round(x: jax.Array) -> jax.Array:
    """Round in log space to nearest power of two index (QIntSoftmax.log_round,
    fq_vit layers.py:340-346)."""
    big = jnp.floor(jnp.log2(jnp.maximum(x, 1e-30)))
    extra = (x - jnp.exp2(big)) >= jnp.exp2(big - 1.0)
    return jnp.where(extra, big + 1.0, big)
