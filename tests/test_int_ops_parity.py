"""Integer-op math parity vs the reference fq_vit implementations.

The reference ships its integer LayerNorm / Log-Int-Softmax short-circuited
(fq_vit layers.py:258, 379) but the component functions
(``QIntSoftmax.int_softmax``, ``log_round``, ``get_MN``) are reachable and
define the intended semantics — we check ours against them directly.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import REFERENCE_DIR, requires_reference

from sam_quantization_tpu.quant.fq import int_ops
from sam_quantization_tpu.quant import quantizers
from sam_quantization_tpu.quant.bit_type import BIT_TYPE_DICT


def _ref_layers():
    torch = pytest.importorskip("torch")
    for p in (REFERENCE_DIR, f"{REFERENCE_DIR}/fq_vit"):
        if p not in sys.path:
            sys.path.insert(0, p)
    from models.ptq import layers  # fq_vit/models/ptq/layers.py

    return torch, layers


@requires_reference
def test_int_softmax_matches_reference(rng):
    torch, layers = _ref_layers()
    x = rng.normal(size=(2, 3, 8, 16)).astype(np.float32) * 4
    scale = np.float32(0.021)
    exp_ref, sum_ref = layers.QIntSoftmax.int_softmax(
        torch.tensor(x), torch.tensor(scale)
    )
    exp_j, sum_j = int_ops.int_softmax_core(jnp.asarray(x), scale)
    np.testing.assert_allclose(np.asarray(exp_j), exp_ref.numpy(), rtol=1e-4, atol=1.0)
    np.testing.assert_allclose(np.asarray(sum_j), sum_ref.numpy(), rtol=1e-4, atol=2.0)


@requires_reference
def test_log_round_matches_reference(rng):
    torch, layers = _ref_layers()
    x = np.abs(rng.normal(size=(64,)).astype(np.float32)) * 100 + 1.0
    ref = layers.QIntSoftmax.log_round(torch.tensor(x.copy()))
    got = quantizers.log_round(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=0)


@requires_reference
def test_get_mn_matches_reference(rng):
    torch, layers = _ref_layers()
    ln = layers.QIntLayerNorm(8)
    a = np.abs(rng.normal(size=(32,)).astype(np.float32)) * 10 + 1e-3
    m_ref, n_ref = ln.get_MN(torch.tensor(a))
    m_j, n_j = int_ops.get_mn(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(n_j), n_ref.numpy())
    np.testing.assert_allclose(np.asarray(m_j), m_ref.numpy())


def test_full_lis_close_to_softmax(rng):
    """The complete LIS pipeline approximates softmax (coarse uint4 log2)."""
    x = rng.normal(size=(4, 16, 32)).astype(np.float32) * 3
    scale = np.float32(0.05)
    out = np.asarray(
        int_ops.log_int_softmax(jnp.asarray(x), scale, BIT_TYPE_DICT["uint4"])
    )
    import scipy.special

    ref = scipy.special.softmax(x, axis=-1)
    # log2-grid outputs: every value is a power of two or 0; rows sum near 1
    nz = out[out > 0]
    np.testing.assert_allclose(np.log2(nz), np.round(np.log2(nz)), atol=1e-6)
    assert np.abs(out.sum(-1) - 1).max() < 0.5
    # the FP-softmax argmax always lands in LIS's top (coarse) bucket —
    # exact argmax can differ within a bucket due to log2 ties
    top = np.take_along_axis(out, ref.argmax(-1)[..., None], axis=-1)[..., 0]
    assert (top == out.max(-1)).mean() > 0.95


def test_int_layer_norm_close_to_fp(rng):
    """Integer LN with PTF scales tracks FP LayerNorm within quantized grid."""
    C = 64
    x = rng.normal(size=(2, 10, C)).astype(np.float32)
    weight = rng.normal(size=(C,)).astype(np.float32) * 0.5 + 1.0
    bias = rng.normal(size=(C,)).astype(np.float32) * 0.1
    base = np.float32(0.004)
    in_scale = base * 2 ** rng.integers(0, 4, size=(C,)).astype(np.float32)
    xq = np.round(x / in_scale) * in_scale  # input already on the PTF grid
    out_scale = np.float32(0.02)
    got = np.asarray(
        int_ops.int_layer_norm(
            jnp.asarray(xq), jnp.asarray(weight), jnp.asarray(bias),
            jnp.asarray(in_scale), out_scale,
        )
    )
    mean = xq.mean(-1, keepdims=True)
    var = ((xq - mean) ** 2).mean(-1, keepdims=True)
    ref = (xq - mean) / np.sqrt(var + 1e-12) * weight + bias
    err = np.abs(got - ref).mean()
    assert err < 3 * out_scale, err
    # outputs land on the out_scale grid
    np.testing.assert_allclose(got / out_scale, np.round(got / out_scale), atol=1e-3)
