"""Range observers as pure streaming reductions.

Counterparts of fq_vit/models/ptq/observer/{minmax,ema,percentile,omse,ptf}.py
with identical math — but expressed as pure functions over a small
:class:`ObserverState` pytree, so calibration runs *inside* jit: the model's
calibration forward threads states through and returns the updated pytree, no
module mutation, no host sync per layer.

Channel semantics: activations are channels-last everywhere in this codebase
(NHWC / (B, L, C)), so "channel-wise" reduces over all leading axes. Weights
are (K_in, N_out); the quantized channel is the output axis N (the reference's
(O, -1) reshape, observer/base.py:20-27, transposed into our layout).

The OMSE (LAPQ-style 90-step range shrink, omse.py:32-56) and PTF
(power-of-two-factor per-channel mask, ptf.py:31-74) parameter searches are
vectorized over channels/candidates instead of Python loops.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sam_quantization_tpu.quant.bit_type import BitType

EPS = jnp.finfo(jnp.float32).eps


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ObserverState:
    """Running min/max (scalar for layer-wise, (C,) for channel-wise)."""

    min_val: jax.Array
    max_val: jax.Array
    initialized: jax.Array  # bool scalar


def init_state(channels: Optional[int]) -> ObserverState:
    shape = () if channels is None else (channels,)
    return ObserverState(
        min_val=jnp.zeros(shape, jnp.float32),
        max_val=jnp.zeros(shape, jnp.float32),
        initialized=jnp.array(False),
    )


def _reduce(x: jax.Array, channel_wise: bool) -> Tuple[jax.Array, jax.Array]:
    xf = x.astype(jnp.float32)
    if channel_wise:
        flat = xf.reshape(-1, xf.shape[-1])
        return flat.min(axis=0), flat.max(axis=0)
    return xf.min(), xf.max()


def update(
    state: ObserverState,
    x: jax.Array,
    method: str,
    channel_wise: bool,
    ema_sigma: float = 0.01,
    percentile_alpha: float = 0.99999,
    percentile_sigma: float = 0.01,
) -> ObserverState:
    """One calibration-batch update (the reference's ``observer.update``)."""
    if method == "percentile":
        # layer-wise only, like the reference (percentile.py:26)
        flat = x.astype(jnp.float32).reshape(-1)
        cur_max = jnp.quantile(flat, percentile_alpha)
        cur_min = jnp.quantile(flat, 1.0 - percentile_alpha)
        new_min = state.min_val + percentile_sigma * (cur_min - state.min_val)
        new_max = state.max_val + percentile_sigma * (cur_max - state.max_val)
    else:
        cur_min, cur_max = _reduce(x, channel_wise)
        if method == "ema":
            new_min = state.min_val + ema_sigma * (cur_min - state.min_val)
            new_max = state.max_val + ema_sigma * (cur_max - state.max_val)
        else:  # minmax / omse / ptf all track running min/max
            new_min = jnp.minimum(state.min_val, cur_min)
            new_max = jnp.maximum(state.max_val, cur_max)
    first = jnp.logical_not(state.initialized)
    return ObserverState(
        min_val=jnp.where(first, cur_min, new_min),
        max_val=jnp.where(first, cur_max, new_max),
        initialized=jnp.array(True),
    )


def _uniform_params(min_val, max_val, bt: BitType, symmetric: bool):
    qmax, qmin = bt.upper_bound, bt.lower_bound
    if symmetric:
        m = jnp.maximum(-min_val, max_val)
        scale = jnp.maximum(m / (float(qmax - qmin) / 2), EPS)
        zero = jnp.zeros_like(scale)
    else:
        scale = jnp.maximum((max_val - min_val) / float(qmax - qmin), EPS)
        zero = jnp.clip(qmin - jnp.round(min_val / scale), qmin, qmax)
    return scale, zero


def _fake_quant(x, scale, zero, bt: BitType):
    q = jnp.clip(jnp.round(x / scale + zero), bt.lower_bound, bt.upper_bound)
    return (q - zero) * scale


def get_quantization_params(
    state: ObserverState,
    method: str,
    bt: BitType,
    channel_wise: bool,
    inputs: Optional[jax.Array] = None,
    symmetric: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Finalize (scale, zero_point). ``inputs`` is the last calibration batch
    (required for omse/ptf, mirroring last_calibrate semantics,
    fq_vit layers.py:56-60)."""
    if symmetric is None:
        symmetric = bt.signed
    min_val, max_val = state.min_val, state.max_val
    qmax, qmin = bt.upper_bound, bt.lower_bound

    if method in ("minmax", "ema", "percentile"):
        return _uniform_params(min_val, max_val, bt, symmetric)

    if method == "omse":
        assert inputs is not None
        xf = inputs.astype(jnp.float32)
        shrink = 1.0 - jnp.arange(90, dtype=jnp.float32) * 0.01  # (90,)

        def score(s):
            new_max = max_val * s
            new_min = min_val * s
            scale = jnp.maximum((new_max - new_min) / float(qmax - qmin), EPS)
            zero = jnp.clip(qmin - jnp.round(new_min / scale), qmin, qmax)
            if channel_wise:
                err = (_fake_quant(xf, scale, zero, bt) - xf) ** 2
                return err.reshape(-1, err.shape[-1]).sum(axis=0), scale, zero
            return ((_fake_quant(xf, scale, zero, bt) - xf) ** 2).sum(), scale, zero

        scores, scales, zeros = jax.vmap(score)(shrink)
        best = jnp.argmin(scores, axis=0)
        if channel_wise:
            c = jnp.arange(scales.shape[-1])
            return scales[best, c], zeros[best, c]
        return scales[best], zeros[best]

    if method == "ptf":
        # Power-of-Two Factor (FQ-ViT): one layer-wise 8-bit base scale, then
        # a per-channel factor in {1, 2, 4, 8} chosen by L2 loss (ptf.py:31-74).
        assert inputs is not None
        xf = inputs.astype(jnp.float32).reshape(-1, inputs.shape[-1])  # (M, C)
        max_t = max_val.max()
        min_t = min_val.min()
        scale8 = jnp.maximum((max_t - min_t) / float(qmax - qmin), EPS)
        zero = jnp.clip(qmin - jnp.round(min_t / scale8), qmin, qmax)
        cand = scale8 / jnp.array([8.0, 4.0, 2.0, 1.0])  # scale1, 2, 4, 8

        def score(s):
            err = (_fake_quant(xf, s, zero, bt) - xf) ** 2
            return err.sum(axis=0)  # (C,)

        scores = jax.vmap(score)(cand)  # (4, C)
        best = jnp.argmin(scores, axis=0)  # 0 → factor 1 on scale1 grid
        scale1 = scale8 / 8.0
        scale = scale1 * (2.0 ** best.astype(jnp.float32))
        return scale, jnp.broadcast_to(zero, scale.shape)

    raise NotImplementedError(method)


def weight_params(
    w: jax.Array, bt: BitType, channel_wise: bool = True
) -> Tuple[jax.Array, jax.Array]:
    """Min-max params for an (K_in, N_out) weight; channel axis = N (the
    reference's channel-wise weight observer on (O, -1), minmax.py:15-29)."""
    wf = w.astype(jnp.float32)
    if channel_wise:
        mn, mx = wf.min(axis=0), wf.max(axis=0)
    else:
        mn, mx = wf.min(), wf.max()
    return _uniform_params(mn, mx, bt, bt.signed)
