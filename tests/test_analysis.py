"""Per-op SNR analysis tests (graphwise + layerwise)."""

import numpy as np
import jax
import jax.numpy as jnp

from sam_quantization_tpu.models import image_encoder
from sam_quantization_tpu.models.configs import VIT_TINY
from sam_quantization_tpu.quant import analysis, gptq, sequential

ECFG = VIT_TINY.image_encoder


def test_graphwise_and_layerwise_snr(rng):
    params = image_encoder.init(jax.random.PRNGKey(0), ECFG)
    batches = [
        jnp.asarray(rng.normal(size=(1, ECFG.img_size, ECFG.img_size, 3)).astype(np.float32))
    ]
    q8 = sequential.rtn_quantize_encoder(params, gptq.GPTQConfig(bits=8, groupsize=32))
    q2 = sequential.rtn_quantize_encoder(params, gptq.GPTQConfig(bits=2, groupsize=32))

    snr8 = analysis.graphwise_error_analyse(params, q8, ECFG, batches)
    snr2 = analysis.graphwise_error_analyse(params, q2, ECFG, batches)
    assert len(snr8) >= ECFG.depth * 4
    mean8 = np.mean(list(snr8.values()))
    mean2 = np.mean(list(snr2.values()))
    assert mean8 > mean2 + 10  # int8 much cleaner than int2
    assert mean8 > 30

    lw = analysis.layerwise_error_analyse(params, q8, ECFG, batches)
    assert len(lw) == ECFG.depth * 4
    assert np.mean(list(lw.values())) > 30
    report = analysis.format_report(snr8)
    assert "SNR" in report
