"""Quantization context protocol threaded through model apply functions.

The reference instruments its model with ~20 stateful ``QAct`` modules per
encoder block (fq_vit/models/sam/image_encoder.py:216-478). Our models are
pure functions, so instrumentation is a *context object* passed to apply: the
model calls ``ctx.act(path, x)`` / ``ctx.softmax(path, a, scale_path)`` /
``ctx.layer_norm(...)`` at the same observation points, and the context
decides what happens there:

  * :class:`NullCtx` — identity everywhere: the FP / GPTQ model.
  * ``quant.fq.FQCtx`` — FQ-ViT calibration (collects observer stats as a
    side dict, pure under jit) or fake-quant/integer-op inference.

Because contexts only insert elementwise ops, everything stays jit-traceable
and fully fusable by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sam_quantization_tpu.nn import functional as F


class NullCtx:
    """FP behavior at every hook; also the base class for quant contexts."""

    def linear(self, path: str, p, x):
        return F.linear(p, x)

    def conv2d(self, path: str, p, x, stride=1, padding=0):
        return F.conv2d(p, x, stride=stride, padding=padding)

    def conv_transpose2d(self, path: str, p, x, stride=2):
        return F.conv_transpose2d(p, x, stride=stride)

    def act(self, path: str, x, ln_input: bool = False):
        """Activation observation point (a ``QAct`` in the reference)."""
        return x

    def softmax(self, path: str, attn, scale_path: str | None = None, axis: int = -1):
        """Softmax observation point (``QIntSoftmax``/LIS in the reference)."""
        return jax.nn.softmax(attn.astype(jnp.float32), axis=axis).astype(attn.dtype)

    def layer_norm(
        self,
        path: str,
        p,
        x,
        eps: float,
        in_path: str | None = None,
        out_path: str | None = None,
        in_scale_expand: int = 1,
    ):
        """LayerNorm point. Quant contexts may run the integer (PTF) LN using
        the quantizers at ``in_path`` / ``out_path``."""
        return F.layer_norm(p, x, eps)


NULL_CTX = NullCtx()
