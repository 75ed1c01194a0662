"""Quantized artifact save/load round trip."""

import numpy as np
import jax
import jax.numpy as jnp

from sam_quantization_tpu.models import image_encoder
from sam_quantization_tpu.models.configs import VIT_TINY
from sam_quantization_tpu.nn.packed import PackedLinear
from sam_quantization_tpu.quant import artifacts, gptq, sequential


def test_artifact_roundtrip(tmp_path, rng):
    params = image_encoder.init(jax.random.PRNGKey(0), VIT_TINY.image_encoder)
    qcfg = gptq.GPTQConfig(bits=4, groupsize=32, sym=True)
    qp = sequential.rtn_quantize_encoder(params, qcfg)
    x = jnp.asarray(
        rng.normal(size=(1, VIT_TINY.image_encoder.img_size,
                         VIT_TINY.image_encoder.img_size, 3)).astype(np.float32)
    )
    out_before = np.asarray(
        image_encoder.apply(qp, x, VIT_TINY.image_encoder, attn_impl="xla")
    )

    d = str(tmp_path / "artifact")
    artifacts.save_quantized(d, qp, {"method": "rtn", "wbits": 4, "groupsize": 32})
    loaded, cfg = artifacts.load_quantized(d)
    assert cfg["wbits"] == 4
    lin = loaded["blocks"][0]["attn"]["qkv"]
    assert isinstance(lin, PackedLinear)
    assert lin.bits == 4 and lin.sym is True  # static meta survives round trip
    out_after = np.asarray(
        image_encoder.apply(loaded, x, VIT_TINY.image_encoder, attn_impl="xla")
    )
    np.testing.assert_allclose(out_after, out_before, rtol=1e-6, atol=1e-6)
