"""Golden-value regression pins: fixed-seed, fixed-input outputs of the full
model, frozen at round 1. Catches silent numerical drift across refactors
(the counterpart of the reference's DEBUG reconstruction-error checks,
gptq.py:144-148, promoted to a real test)."""

import numpy as np
import jax
import jax.numpy as jnp

from sam_quantization_tpu.models import sam as sam_lib
from sam_quantization_tpu.models.configs import VIT_TINY


def test_golden_forward_pins():
    model = sam_lib.init(jax.random.PRNGKey(7), VIT_TINY)
    x = jnp.asarray(
        np.linspace(0, 255, 1 * 128 * 128 * 3, dtype=np.float32).reshape(1, 128, 128, 3)
    )
    emb = sam_lib.encode_image(model, sam_lib.preprocess(model, x), attn_impl="xla")
    coords = jnp.array([[[64.0, 64.0]]])
    labels = jnp.array([[1.0]])
    low, iou = sam_lib.decode_masks(
        model, emb, points=(coords, labels), multimask_output=False
    )
    e, l = np.asarray(emb), np.asarray(low)
    # frozen 2026-08-17 (round 1), CPU fp32; tolerances absorb platform fp noise
    np.testing.assert_allclose(e.mean(), 5.588e-09, atol=1e-6)
    np.testing.assert_allclose(e.std(), 0.99999756, rtol=1e-4)
    np.testing.assert_allclose(e[0, 3, 5, 7], -0.68819928, rtol=1e-3)
    np.testing.assert_allclose(l.mean(), 0.02208020, rtol=1e-3)
    np.testing.assert_allclose(l.std(), 0.02981719, rtol=1e-3)
    np.testing.assert_allclose(l[0, 0, 20, 20], -0.01579731, rtol=2e-3)
    np.testing.assert_allclose(float(np.asarray(iou)[0, 0]), -0.25990996, rtol=1e-3)
