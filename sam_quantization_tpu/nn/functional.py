"""Functional NN primitives over parameter pytrees.

Every layer is a pure function ``f(params, x, ...)``; parameters are plain
dicts of arrays (or :class:`PackedLinear` for quantized layers). The linear
entry point dispatches on the parameter type, so quantizing a model is a tree
transform that swaps ``{'w', 'b'}`` dicts for ``PackedLinear`` nodes — no
module surgery (contrast with the reference's in-place ``make_quant`` module
replacement, gptq_triton/quant_linear.py:15-36).

Layout conventions (TPU-first):
  * linear weights are stored ``(in_features, out_features)`` so the apply is
    ``x @ w`` with no transpose;
  * convs run NHWC with HWIO kernels (XLA's preferred TPU layout);
  * LayerNorm reduces in float32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sam_quantization_tpu.nn.packed import IntLinear, PackedLinear, dequantize


def linear(p, x: jax.Array, *, precision=None) -> jax.Array:
    """Apply a linear layer; dispatches on param type.

    ``p`` is either ``{'w': (K, N), 'b': (N,)?}`` or a :class:`PackedLinear`.
    """
    if isinstance(p, (PackedLinear, IntLinear)):
        return quant_linear(p, x, precision=precision)
    y = jnp.dot(x, p["w"].astype(x.dtype), precision=precision)
    b = p.get("b")
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def quant_linear(p: PackedLinear, x: jax.Array, *, precision=None) -> jax.Array:
    """Quantized linear. Uses the fused Pallas dequant-matmul on TPU and a
    jnp dequantize-then-matmul reference path elsewhere.

    Counterpart of the reference Triton ``matmul4`` launcher
    (gptq_triton/quant_linear.py:355-437) — but allocates its output through
    XLA instead of the reference's shared global workspace buffer
    (quant_linear.py:13), which is an aliasing hazard we deliberately avoid.
    """
    from sam_quantization_tpu.ops import quant_matmul

    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if isinstance(p, IntLinear):
        y = quant_matmul.int8_matmul(x2, p)
    else:
        y = quant_matmul.quant_matmul(x2, p)
    y = y.reshape(*lead, p.out_features)
    if p.bias is not None:
        y = y + p.bias.astype(y.dtype)
    return y


def layer_norm(p, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm over the last axis, fp32 statistics."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm_2d(p, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Channel LayerNorm on NHWC tensors.

    Equivalent to the reference's NCHW ``LayerNorm2d``
    (segment_anything/modeling/common.py:31-43) — normalizes over the channel
    axis only. Our canonical conv layout is NHWC, so channels are last and
    this is just :func:`layer_norm` (which conveniently makes the op a lane
    reduction on TPU rather than a strided one).
    """
    return layer_norm(p, x, eps)


def conv2d(
    p,
    x: jax.Array,
    stride: int | tuple = 1,
    padding: int | tuple | str = 0,
) -> jax.Array:
    """NHWC conv with HWIO kernel. ``p = {'w': (kh, kw, I, O), 'b': (O,)?}``."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    w = p["w"]
    kh, kw, I, O = w.shape
    B, H, W, C = x.shape
    if (
        (kh, kw) == tuple(stride)
        and padding == ((0, 0), (0, 0))
        and H % kh == 0
        and W % kw == 0
    ):
        # Non-overlapping patch conv (SAM's 16×16/stride-16 patch embed) is
        # exactly space-to-depth + one MXU matmul — identical math, but it
        # cannot hit a slow convolution lowering.
        xp = x.reshape(B, H // kh, kh, W // kw, kw, C)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, H // kh, W // kw, kh * kw * C
        )
        y = xp @ w.reshape(kh * kw * I, O).astype(x.dtype)
        b = p.get("b")
        if b is not None:
            y = y + b.astype(y.dtype)
        return y
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b = p.get("b")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose2d(p, x: jax.Array, stride: int = 2) -> jax.Array:
    """NHWC transposed conv matching torch ``ConvTranspose2d(k=s, stride=s)``.

    Used only by the mask decoder upscaler and prompt-mask downscaler
    counterparts (mask_decoder.py:53-58). With kernel == stride and no
    padding, the transposed conv is exactly a block-wise linear expansion, so
    we implement it as einsum + reshape — which XLA maps onto the MXU far
    better than a gradient-of-conv.

    ``p['w']`` has shape (kh, kw, I, O).
    """
    w = p["w"].astype(x.dtype)
    kh, kw, cin, cout = w.shape
    assert kh == stride and kw == stride, "only kernel == stride supported"
    B, H, W, _ = x.shape
    y = jnp.einsum("bhwi,pqio->bhpwqo", x, w)
    y = y.reshape(B, H * kh, W * kw, cout)
    b = p.get("b")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def gelu(x: jax.Array) -> jax.Array:
    """GELU matching torch's default ``nn.GELU`` (erf) to the input dtype's
    precision.

    f32 inputs use the exact erf form (bit-parity with the reference torch
    model; all parity tests run f32). bf16 inputs use the tanh
    approximation: its deviation from erf is at most 4.7e-4 in absolute
    value (at |x|≈2.7) — an order of magnitude below bf16 resolution at
    those magnitudes and ~100× below the int8 serving path's activation
    quantization step — while XLA's erf costs ~25 VPU ops/element vs
    tanh's ~10. Measured on v5e at the ViT-H MLP hidden (4096×5120):
    erf-GELU is 0.30 ms/block slower — the single largest non-matmul cost
    in the encoder block."""
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def mlp_block(p, x: jax.Array, act=gelu) -> jax.Array:
    """lin1 → act → lin2 (ref: segment_anything/modeling/common.py:13-27)."""
    return linear(p["lin2"], act(linear(p["lin1"], x)))


# ---------------------------------------------------------------------------
# Initializers (torch-compatible defaults, used when no checkpoint is loaded)
# ---------------------------------------------------------------------------


def init_linear(key, in_features: int, out_features: int, bias: bool = True):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_features)
    p = {
        "w": jax.random.uniform(
            kw, (in_features, out_features), jnp.float32, -bound, bound
        )
    }
    if bias:
        p["b"] = jax.random.uniform(kb, (out_features,), jnp.float32, -bound, bound)
    return p


def init_conv2d(key, kh, kw_, cin, cout, bias: bool = True):
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw_ * cin
    bound = 1.0 / jnp.sqrt(fan_in)
    p = {"w": jax.random.uniform(k1, (kh, kw_, cin, cout), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound)
    return p


def init_layer_norm(dim: int):
    return {"w": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def init_embedding(key, num: int, dim: int):
    return jax.random.normal(key, (num, dim), jnp.float32)


def to_fp32_weight(p) -> jax.Array:
    """Dense (K, N) weight view of a (possibly packed/int-cached) linear
    param — the seam build_sam.to_torch_state_dict exports through."""
    if isinstance(p, PackedLinear):
        return dequantize(p)
    if isinstance(p, IntLinear):
        w8 = p.w8.T if p.layout == "nk" else p.w8  # -> (K, N)
        K, N = w8.shape
        G = p.scales.shape[0]
        wf = w8.astype(jnp.float32)
        if G == 1:
            return wf * p.scales[0][None, :]
        return (wf.reshape(G, K // G, N) * p.scales[:, None, :]).reshape(K, N)
    return p["w"]
