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


def test_artifact_serve_int8_with_act_scales(tmp_path, rng):
    """Artifact → cache_int8 with persisted static act scales (the CLI
    `quantize --sym --act-scales` → `infer --serve-int8` path): the serving
    encoder must stay close to the packed encoder it was derived from."""
    from sam_quantization_tpu.nn.packed import IntLinear, cache_int8
    from sam_quantization_tpu.quant.act_scales import calibrate_act_scales

    ecfg = VIT_TINY.image_encoder
    params = image_encoder.init(jax.random.PRNGKey(1), ecfg)
    qcfg = gptq.GPTQConfig(bits=4, groupsize=32, sym=True)
    qp = sequential.rtn_quantize_encoder(params, qcfg)
    x = jnp.asarray(
        rng.normal(size=(1, ecfg.img_size, ecfg.img_size, 3)).astype(np.float32)
    )
    scales = calibrate_act_scales(params, ecfg, [x], margin=1.1)
    assert scales and all(isinstance(v, float) for v in scales.values())

    d = str(tmp_path / "artifact")
    artifacts.save_quantized(
        d, qp,
        {"method": "rtn", "wbits": 4, "groupsize": 32, "sym": True,
         "act_scales": scales},
    )
    loaded, cfg = artifacts.load_quantized(d)
    serving = cache_int8(loaded, act_scales=cfg["act_scales"])
    lin = serving["blocks"][0]["attn"]["qkv"]
    assert isinstance(lin, IntLinear) and lin.in_scale is not None
    # per-op routing: attn.proj went back to dense bf16
    assert isinstance(serving["blocks"][0]["attn"]["proj"], dict)

    out_packed = np.asarray(image_encoder.apply(qp, x, ecfg, attn_impl="xla"))
    out_serving = np.asarray(
        image_encoder.apply(serving, x, ecfg, attn_impl="xla")
    )
    # int8-requant + static-A8 error stays well under the int4 signal
    rel = np.linalg.norm(out_serving - out_packed) / np.linalg.norm(out_packed)
    assert rel < 0.05, rel
