"""Per-op quantization error analysis (SNR) over the encoder.

Capability counterpart of PPQ's ``graphwise_error_analyse`` /
``layerwise_error_analyse`` as used by the reference
(script/analysis.py:596-625, script/custimized_quant.py:400-410): run the FP
and quantized models on the same data, collect activations at every linear
observation point, and report per-op SNR — the op-granularity "unit test" of
a quantization config.

Functional design: a capture context records linear outputs during one jit
forward per model; the SNR reduction happens on device.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp

from sam_quantization_tpu.models import image_encoder
from sam_quantization_tpu.models.configs import ImageEncoderConfig
from sam_quantization_tpu.nn import functional as F
from sam_quantization_tpu.quant.context import NullCtx


class OutputCaptureCtx(NullCtx):
    """Records every linear-layer output (graph-node granularity)."""

    def __init__(self, base_ctx: Optional[NullCtx] = None):
        self.base = base_ctx or NullCtx()
        self.outputs: Dict[str, jax.Array] = {}

    def linear(self, path, p, x):
        y = self.base.linear(path, p, x)
        self.outputs[path] = y
        return y

    def conv2d(self, path, p, x, stride=1, padding=0):
        y = self.base.conv2d(path, p, x, stride=stride, padding=padding)
        self.outputs[path] = y
        return y

    def act(self, path, x, ln_input=False):
        return self.base.act(path, x, ln_input=ln_input)

    def softmax(self, path, attn, scale_path=None, axis=-1):
        return self.base.softmax(path, attn, scale_path=scale_path, axis=axis)

    def layer_norm(self, path, p, x, eps, in_path=None, out_path=None,
                   in_scale_expand=1):
        return self.base.layer_norm(
            path, p, x, eps, in_path=in_path, out_path=out_path,
            in_scale_expand=in_scale_expand,
        )


def snr_db(ref: jax.Array, test: jax.Array) -> jax.Array:
    """Signal-to-noise ratio in dB (higher is better)."""
    ref = ref.astype(jnp.float32)
    noise = (test.astype(jnp.float32) - ref) ** 2
    signal = ref**2
    return 10.0 * jnp.log10(signal.sum() / jnp.maximum(noise.sum(), 1e-20))


def graphwise_error_analyse(
    fp_params,
    q_params,
    ecfg: ImageEncoderConfig,
    batches: Iterable[jax.Array],
    q_ctx=None,
    fp_ctx=None,
) -> Dict[str, float]:
    """Per-linear-op SNR (dB) of the quantized encoder vs FP on calibration
    batches. The quantized graph runs with *quantized inputs propagated*
    (graphwise semantics); see :func:`layerwise_error_analyse` for isolated
    per-layer error."""

    @jax.jit
    def run_pair(x):
        cf = OutputCaptureCtx(fp_ctx)
        image_encoder.apply(fp_params, x, ecfg, cf, attn_impl="xla")
        cq = OutputCaptureCtx(q_ctx)
        image_encoder.apply(q_params, x, ecfg, cq, attn_impl="xla")
        return {
            k: snr_db(cf.outputs[k], cq.outputs[k])
            for k in cf.outputs
            if k in cq.outputs
        }

    acc: Dict[str, List[float]] = {}
    for x in batches:
        out = run_pair(x)
        for k, v in out.items():
            acc.setdefault(k, []).append(float(v))
    return {k: sum(v) / len(v) for k, v in acc.items()}


def layerwise_error_analyse(
    fp_params,
    q_params,
    ecfg: ImageEncoderConfig,
    batches: Iterable[jax.Array],
) -> Dict[str, float]:
    """Isolated per-layer SNR: every linear gets *FP inputs* and only its own
    weights quantized (PPQ ``layerwise_error_analyse`` semantics — the
    commented usage at script/analysis.py:588-593). Implemented by running
    the FP model while computing each quantized layer's output on the FP
    layer's input."""
    from sam_quantization_tpu.nn.packed import PackedLinear

    class LayerwiseCtx(OutputCaptureCtx):
        def __init__(self, q_tree):
            super().__init__()
            self.q_tree = q_tree
            self.snrs: Dict[str, jax.Array] = {}

        def linear(self, path, p, x):
            y = F.linear(p, x)
            qp = _lookup(self.q_tree, path)
            if qp is not None and (isinstance(qp, PackedLinear) or qp is not p):
                yq = F.linear(qp, x)
                self.snrs[path] = snr_db(y, yq)
            return y

    @jax.jit
    def run(x):
        ctx = LayerwiseCtx(q_params)
        image_encoder.apply(fp_params, x, ecfg, ctx, attn_impl="xla")
        return ctx.snrs

    acc: Dict[str, List[float]] = {}
    for x in batches:
        for k, v in run(x).items():
            acc.setdefault(k, []).append(float(v))
    return {k: sum(v) / len(v) for k, v in acc.items()}


def _lookup(tree, path: str):
    node = tree
    for part in path.split("."):
        if isinstance(node, list):
            node = node[int(part)]
        elif isinstance(node, dict) and part in node:
            node = node[part]
        else:
            return None
    return node


def format_report(snrs: Dict[str, float], worst_k: int = 10) -> str:
    items = sorted(snrs.items(), key=lambda kv: kv[1])
    lines = ["op-wise SNR report (worst first):"]
    for k, v in items[:worst_k]:
        lines.append(f"  {k:<40s} {v:8.2f} dB")
    lines.append(f"  mean: {sum(snrs.values()) / len(snrs):8.2f} dB")
    return "\n".join(lines)
