"""Direct observer/quantizer math tests vs reference-derived expectations."""

import numpy as np
import jax.numpy as jnp

from sam_quantization_tpu.quant import observers, quantizers
from sam_quantization_tpu.quant.bit_type import BIT_TYPE_DICT

UINT8 = BIT_TYPE_DICT["uint8"]
INT8 = BIT_TYPE_DICT["int8"]


def _stream(method, xs, channel_wise=False):
    st = observers.init_state(xs[0].shape[-1] if channel_wise else None)
    for x in xs:
        st = observers.update(st, jnp.asarray(x), method, channel_wise)
    return st


def test_minmax_running_extrema(rng):
    xs = [rng.normal(size=(8, 16)).astype(np.float32) for _ in range(4)]
    st = _stream("minmax", xs)
    stacked = np.concatenate(xs)
    assert np.isclose(float(st.min_val), stacked.min())
    assert np.isclose(float(st.max_val), stacked.max())
    scale, zero = observers.get_quantization_params(st, "minmax", UINT8, False)
    # uint8 asym grid covers the observed range (minmax.py:34-50)
    assert np.isclose(float(scale), (stacked.max() - stacked.min()) / 255, rtol=1e-6)
    q = quantizers.uniform_fake_quant(jnp.asarray(stacked), scale, zero, UINT8)
    assert np.abs(np.asarray(q) - stacked).max() <= float(scale) * 0.51


def test_ema_blends(rng):
    xs = [np.full((4, 4), v, np.float32) for v in (1.0, 2.0)]
    st = _stream("ema", xs)
    # first update initializes; second blends with sigma 0.01 (ema.py:18-29)
    assert np.isclose(float(st.max_val), 1.0 + 0.01 * (2.0 - 1.0))


def test_percentile_matches_quantile(rng):
    x = rng.normal(size=(10000,)).astype(np.float32)
    x[0] = 1e6  # outlier
    st = _stream("percentile", [x.reshape(100, 100)])
    # first update initializes to the 0.99999-quantile exactly
    # (percentile.py:27-43); with n=10k that interpolates toward the max,
    # clipping it only partially — faithful to the reference
    want = np.quantile(x, 0.99999)
    np.testing.assert_allclose(float(st.max_val), want, rtol=1e-5)
    assert float(st.max_val) < x.max()


def test_omse_shrinks_range(rng):
    x = rng.normal(size=(64, 32)).astype(np.float32)
    x[0, 0] = 50.0  # rare outlier the L2 search should sacrifice
    st = _stream("omse", [x])
    scale, zero = observers.get_quantization_params(
        st, "omse", UINT8, False, inputs=jnp.asarray(x)
    )
    naive_scale = (x.max() - x.min()) / 255
    assert float(scale) < naive_scale  # range was shrunk


def test_ptf_power_of_two_structure(rng):
    x = rng.normal(size=(128, 16)).astype(np.float32)
    x[:, 3] *= 8.0  # one big channel
    st = _stream("ptf", [x], channel_wise=True)
    scale, zero = observers.get_quantization_params(
        st, "ptf", UINT8, True, inputs=jnp.asarray(x)
    )
    s = np.asarray(scale)
    ratios = s / s.min()
    # every channel scale is the base scale times a power of two in {1,2,4,8}
    assert set(np.unique(np.round(ratios))).issubset({1.0, 2.0, 4.0, 8.0})
    assert ratios[3] > 1.0  # big channel got a bigger factor
    assert np.asarray(zero).shape == s.shape


def test_weight_params_channelwise(rng):
    w = rng.normal(size=(32, 8)).astype(np.float32)
    scale, zero = observers.weight_params(jnp.asarray(w), INT8)
    assert scale.shape == (8,)
    # symmetric int8: scale from per-channel absmax (minmax.py:41-45)
    want = np.maximum(np.abs(w).max(0), 1e-12) / 127.5
    np.testing.assert_allclose(np.asarray(scale), want, rtol=1e-5)
