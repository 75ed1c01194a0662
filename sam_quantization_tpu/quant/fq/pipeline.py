"""FQ-ViT full post-training-quantization pipeline, functional.

Capability counterpart of the reference's ``fq_vit`` package: int8 weights
(channel-wise, symmetric minmax), uint8 activations (layer-wise, observer
selectable minmax/ema/percentile/omse), PTF (power-of-two-factor) channel-wise
observers feeding an *enabled* integer LayerNorm, and Log-Int-Softmax with
uint4 log2 output quantization (also enabled — the reference ships both
short-circuited, fq_vit layers.py:258, 379).

Where the reference mutates ~20 stateful QAct modules per block
(fq_vit/models/sam/image_encoder.py), here:
  * calibration is a pure jit-compiled function: the model runs with an
    :class:`FQCtx` in ``calib`` mode and returns updated observer states as a
    dict pytree (mode flags walk no module tree — they're just a different
    ctx, counterpart of sam.py:208-234's model_open_calibrate etc.);
  * the final batch runs in ``last_calib`` mode, computing (scale, zero) per
    observation point (incl. the OMSE/PTF searches on that batch);
  * ``quant`` mode fake-quantizes activations at every point and runs the
    integer LN / LIS paths; weights are fake-quantized once, offline, by
    :func:`fq_quantize_weights`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp

from sam_quantization_tpu.models import image_encoder
from sam_quantization_tpu.models.configs import ImageEncoderConfig
from sam_quantization_tpu.nn import functional as F
from sam_quantization_tpu.quant import observers, quantizers
from sam_quantization_tpu.quant.bit_type import BIT_TYPE_DICT, BitType
from sam_quantization_tpu.quant.context import NullCtx
from sam_quantization_tpu.quant.fq import int_ops


@dataclasses.dataclass(frozen=True)
class FQConfig:
    """Counterpart of fq_vit/config.py:4-43."""

    bit_w: BitType = BIT_TYPE_DICT["int8"]
    bit_a: BitType = BIT_TYPE_DICT["uint8"]
    observer_w: str = "minmax"
    observer_a: str = "minmax"  # minmax | ema | percentile | omse
    int_softmax: bool = True  # LIS → uint4 log2 softmax
    int_norm: bool = True  # PTF → channel-wise ptf observer on LN inputs
    bit_s: BitType = BIT_TYPE_DICT["uint4"]

    @property
    def observer_a_ln(self) -> str:
        return "ptf" if self.int_norm else self.observer_a

    @property
    def a_ln_channel_wise(self) -> bool:
        return self.int_norm


QParams = Dict[str, Tuple[jax.Array, jax.Array]]
ObserverStates = Dict[str, observers.ObserverState]


class FQCtx(NullCtx):
    """Quantization context implementing the observation-point protocol."""

    def __init__(
        self,
        mode: str,  # "calib" | "last_calib" | "quant"
        cfg: FQConfig,
        state: Optional[ObserverStates] = None,
        qparams: Optional[QParams] = None,
        overrides=None,  # QuantOverrides: per-point observer/bits/skip
    ):
        assert mode in ("calib", "last_calib", "quant")
        self.mode = mode
        self.cfg = cfg
        self.state = state or {}
        self.qparams = qparams or {}
        self.overrides = overrides
        self.updates: ObserverStates = {}
        self.new_qparams: QParams = {}
        # quant mode: records per-LN execution path ("int" | "fp") so tests
        # can assert no LayerNorm silently falls back to FP when int_norm=True
        self.ln_modes: Dict[str, str] = {}

    # -- activation hook ---------------------------------------------------

    def act(self, path: str, x, ln_input: bool = False):
        cfg = self.cfg
        ov = self.overrides.match(path) if self.overrides else None
        if ov is not None and ov.skip:
            return x  # excluded observation point: stays FP end to end
        if ln_input and cfg.int_norm:
            method, channel_wise = cfg.observer_a_ln, True
        else:
            method, channel_wise = cfg.observer_a, False
        if ov is not None and ov.observer and not (ln_input and cfg.int_norm):
            method = ov.observer
        bt = cfg.bit_a
        if ov is not None and ov.bits is not None:
            bt = BIT_TYPE_DICT[f"uint{ov.bits}" if not bt.signed else f"int{ov.bits}"]
        if self.mode in ("calib", "last_calib"):
            st = self.state.get(path)
            if st is None:
                st = observers.init_state(x.shape[-1] if channel_wise else None)
            st = observers.update(st, x, method, channel_wise)
            self.updates[path] = st
            if self.mode == "last_calib":
                self.new_qparams[path] = observers.get_quantization_params(
                    st, method, bt, channel_wise, inputs=x
                )
            return x
        if path not in self.qparams:
            # Observation point never executed during calibration (e.g. the
            # mask-prompt path under point-only calibration): leave FP rather
            # than quantize with garbage params.
            return x
        scale, zero = self.qparams[path]
        return quantizers.uniform_fake_quant(x, scale, zero, bt)

    # -- softmax hook ------------------------------------------------------

    def softmax(self, path: str, attn, scale_path: Optional[str] = None, axis: int = -1):
        cfg = self.cfg
        if self.mode == "quant" and cfg.int_softmax and scale_path in self.qparams:
            scale = self.qparams[scale_path][0]
            return int_ops.log_int_softmax(attn, scale, cfg.bit_s)
        out = jax.nn.softmax(attn.astype(jnp.float32), axis=axis).astype(attn.dtype)
        if self.mode in ("calib", "last_calib"):
            if not cfg.int_softmax:
                # uniform path observes the softmax output (layers.py:391-398)
                st = self.state.get(path) or observers.init_state(None)
                st = observers.update(st, out, cfg.observer_a, False)
                self.updates[path] = st
                if self.mode == "last_calib":
                    self.new_qparams[path] = observers.get_quantization_params(
                        st, cfg.observer_a, cfg.bit_s, False, inputs=out
                    )
            return out
        if self.mode == "quant":
            if cfg.int_softmax:
                # no input scale recorded (FP attn input): log2-only quant
                return quantizers.log2_fake_quant(out, cfg.bit_s)
            scale, zero = self.qparams[path]
            return quantizers.uniform_fake_quant(out, scale, zero, cfg.bit_s)
        return out

    # -- layernorm hook ----------------------------------------------------

    def layer_norm(
        self,
        path: str,
        p,
        x,
        eps: float,
        in_path: Optional[str] = None,
        out_path: Optional[str] = None,
        in_scale_expand: int = 1,
    ):
        if (
            self.mode == "quant"
            and self.cfg.int_norm
            and in_path in self.qparams
            and out_path in self.qparams
        ):
            self.ln_modes[path] = "int"
            return int_ops.int_layer_norm(
                x,
                p["w"].astype(jnp.float32),
                p["b"].astype(jnp.float32),
                in_scale=self.qparams[in_path][0],
                out_scale=self.qparams[out_path][0],
                in_scale_expand=in_scale_expand,
            )
        if self.mode == "quant":
            self.ln_modes[path] = "fp"
        return F.layer_norm(p, x, eps)


# ---------------------------------------------------------------------------
# Weight fake-quantization (offline, one-shot)
# ---------------------------------------------------------------------------

_LINEAR_KEYS = ("w",)


def fq_quantize_weights(params, cfg: FQConfig):
    """Fake-quantize every linear/conv weight in a parameter tree, int8
    channel-wise symmetric minmax (reference QLinear/QConv2d weight path,
    fq_vit layers.py:96-140, 180-242). Output channel = last axis."""

    def quant_leaf(path_elems, leaf):
        return leaf

    def walk(node):
        if isinstance(node, dict):
            if "w" in node and node["w"].ndim in (2, 4):
                w = node["w"]
                w2 = w.reshape(-1, w.shape[-1])
                scale, zero = observers.weight_params(w2, cfg.bit_w)
                wq = quantizers.uniform_fake_quant(w2, scale, zero, cfg.bit_w)
                return {**node, "w": wq.reshape(w.shape)}
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


# ---------------------------------------------------------------------------
# Calibration driver (encoder scope)
# ---------------------------------------------------------------------------


def calibrate_encoder(
    params,
    ecfg: ImageEncoderConfig,
    fqcfg: FQConfig,
    batches: Iterable[jax.Array],
    overrides=None,
) -> QParams:
    """Stream calibration batches (preprocessed NHWC images) through the
    encoder; final batch finalizes quantization params.

    Counterpart of fq_vit/test_quant.py:276-292's calibrate loop + the
    model_open_last_calibrate step. ``overrides``: per-point
    observer/bits/skip rules (quant.overrides.QuantOverrides).
    """

    @functools.partial(jax.jit, static_argnames=("mode",))
    def step(params, x, state, mode):
        ctx = FQCtx(mode, fqcfg, state, overrides=overrides)
        image_encoder.apply(params, x, ecfg, ctx, attn_impl="xla")
        return {**state, **ctx.updates}, ctx.new_qparams

    batches = list(batches)
    state: ObserverStates = {}
    qparams: QParams = {}
    for i, x in enumerate(batches):
        mode = "last_calib" if i == len(batches) - 1 else "calib"
        state, qparams = step(params, x, state, mode)
    return qparams


def quantize_encoder(
    params, ecfg: ImageEncoderConfig, fqcfg: FQConfig, qparams: QParams,
    overrides=None,
):
    """Return (quantized params, quant ctx factory) for inference."""
    qp = fq_quantize_weights(params, fqcfg)

    def make_ctx():
        return FQCtx("quant", fqcfg, qparams=qparams, overrides=overrides)

    return qp, make_ctx


# ---------------------------------------------------------------------------
# Full-SAM calibration: the reference calibrates through a 1-click SAM loop
# (fq_vit/test_quant.py:141-204 calibrate_forward), so decoder-side
# observation points see click-conditioned activations.
# ---------------------------------------------------------------------------


def calibrate_sam(
    model,
    samples,
    fqcfg: FQConfig,
    max_points: int = 24,
    overrides=None,
) -> QParams:
    """Calibrate encoder + mask-decoder observation points with a 1-click
    forward per sample. ``samples``: iterable of (image (1, S, S, 3) float,
    gt mask (S, S)) pairs; the click lands at the gt's center of mass.
    ``overrides``: per-point observer/bits/skip rules (quant.overrides) —
    the diagnose→act seam, as in the reference's per-op
    init_quantize_config overrides (script/custimized_quant.py:56-147).
    """
    import numpy as np

    from sam_quantization_tpu.models import sam as sam_lib

    @functools.partial(jax.jit, static_argnames=("mode",))
    def step(model, x, coords, labels, state, mode):
        ctx = FQCtx(mode, fqcfg, state, overrides=overrides)
        emb = sam_lib.encode_image(model, sam_lib.preprocess(model, x), ctx,
                                   attn_impl="xla")
        # The reference calibrates with masks=low_res_masks (zeros before the
        # first click, fq_vit/test_quant.py:182-187), so the mask-downscaling
        # observation points see the prompt path too.
        h, w = model.config.prompt_encoder.image_embedding_size
        zero_mask = jnp.zeros((x.shape[0], 4 * h, 4 * w, 1), jnp.float32)
        sam_lib.decode_masks(
            model, emb, points=(coords, labels), mask_inputs=zero_mask,
            multimask_output=False, ctx=ctx,
        )
        return {**state, **ctx.updates}, ctx.new_qparams

    samples = list(samples)
    state: ObserverStates = {}
    qparams: QParams = {}
    for i, (img, gt) in enumerate(samples):
        ys, xs = np.nonzero(gt)
        cy, cx = (int(ys.mean()), int(xs.mean())) if len(ys) else (0, 0)
        coords = np.zeros((1, max_points, 2), np.float32)
        labels = -np.ones((1, max_points), np.float32)
        coords[0, 0] = (cx, cy)
        labels[0, 0] = 1.0
        mode = "last_calib" if i == len(samples) - 1 else "calib"
        state, qparams = step(
            model, jnp.asarray(img), jnp.asarray(coords), jnp.asarray(labels),
            state, mode,
        )
    return qparams


def quantize_sam(model, fqcfg: FQConfig, qparams: QParams, overrides=None):
    """Fake-quantize all weights of a Sam pytree; returns (model, ctx factory)."""
    from sam_quantization_tpu.models.sam import Sam

    qmodel = Sam(
        image_encoder=fq_quantize_weights(model.image_encoder, fqcfg),
        prompt_encoder=fq_quantize_weights(model.prompt_encoder, fqcfg),
        mask_decoder=fq_quantize_weights(model.mask_decoder, fqcfg),
        config=model.config,
    )

    def make_ctx():
        return FQCtx("quant", fqcfg, qparams=qparams, overrides=overrides)

    return qmodel, make_ctx


def fq_pointwise_snr(model, samples, fqcfg: FQConfig, qparams: QParams,
                     max_points: int = 24):
    """Diagnose: per-observation-point LOCAL quantization SNR under the
    ``quant`` ctx — for each QAct point, 10·log10(‖x‖²/‖x−q(x)‖²) of the
    activation it actually sees (downstream of all upstream quantization).
    The FQ analog of layerwise_error_analyse (ref graphwise_error_analyse,
    script/analysis.py:596-625); feed the worst points to
    ``quant.overrides.QuantOverrides`` and recalibrate.

    Returns {path: snr_db} sorted ascending (worst first).
    """
    import numpy as np

    from sam_quantization_tpu.models import sam as sam_lib
    from sam_quantization_tpu.quant import quantizers as qz

    class SnrCtx(FQCtx):
        def __init__(self):
            super().__init__("quant", fqcfg, qparams=qparams)
            self.err: Dict[str, jax.Array] = {}
            self.pw: Dict[str, jax.Array] = {}

        def act(self, path, x, ln_input=False):
            y = super().act(path, x, ln_input=ln_input)
            xf = x.astype(jnp.float32)
            yf = y.astype(jnp.float32)
            self.err[path] = self.err.get(path, 0.0) + jnp.sum((xf - yf) ** 2)
            self.pw[path] = self.pw.get(path, 0.0) + jnp.sum(xf**2)
            return y

    @jax.jit
    def run(model, x, coords, labels):
        ctx = SnrCtx()
        emb = sam_lib.encode_image(model, sam_lib.preprocess(model, x), ctx,
                                   attn_impl="xla")
        h, w = model.config.prompt_encoder.image_embedding_size
        zero_mask = jnp.zeros((x.shape[0], 4 * h, 4 * w, 1), jnp.float32)
        sam_lib.decode_masks(
            model, emb, points=(coords, labels), mask_inputs=zero_mask,
            multimask_output=False, ctx=ctx,
        )
        return ctx.err, ctx.pw

    err: Dict[str, float] = {}
    pw: Dict[str, float] = {}
    for img, gt in samples:
        ys, xs = np.nonzero(gt)
        cy, cx = (int(ys.mean()), int(xs.mean())) if len(ys) else (0, 0)
        coords = np.zeros((1, max_points, 2), np.float32)
        labels = -np.ones((1, max_points), np.float32)
        coords[0, 0] = (cx, cy)
        labels[0, 0] = 1.0
        e, p = run(model, jnp.asarray(img), jnp.asarray(coords),
                   jnp.asarray(labels))
        for k in e:
            err[k] = err.get(k, 0.0) + float(e[k])
            pw[k] = pw.get(k, 0.0) + float(p[k])
    snr = {
        k: 10.0 * np.log10(max(pw[k], 1e-30) / max(err[k], 1e-30))
        for k in err
    }
    return dict(sorted(snr.items(), key=lambda kv: kv[1]))
