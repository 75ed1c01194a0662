"""Utility-layer tests: experiment dirs, config registry, viz, augment."""

import numpy as np

from sam_quantization_tpu.utils import config as cfg_lib
from sam_quantization_tpu.utils import experiment, vis
from sam_quantization_tpu.data import augment


def test_experiment_dirs(tmp_path):
    d1 = experiment.init_experiment(str(tmp_path), "run")
    d2 = experiment.init_experiment(str(tmp_path), "run")
    assert d1.name == "000-run" and d2.name == "001-run"
    assert (d1 / "checkpoints").is_dir()
    d3 = experiment.init_experiment(str(tmp_path), resume_prefix="001")
    assert d3 == d2


def test_scalar_writer(tmp_path):
    w = experiment.ScalarWriterAvg(str(tmp_path), dump_period=2)
    w.add_scalar("loss", 1.0, 1)
    w.add_scalar("loss", 3.0, 2)
    w.close()
    import json

    lines = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert lines[0]["value"] == 2.0


def test_config_registry(tmp_path):
    p = tmp_path / "config.yml"
    p.write_text("SBD_PATH: /data/sbd\nEXPS_PATH: ./out\n")
    cfg = cfg_lib.load_config(str(p))
    assert cfg_lib.dataset_path(cfg, "sbd") == "/data/sbd"
    assert cfg["GRABCUT_PATH"]  # default preserved


def test_vis_overlays(rng):
    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), bool)
    mask[8:16, 8:16] = True
    out = vis.blend_mask(img, mask)
    assert out.shape == img.shape and (out[10, 10] != img[10, 10]).any()
    out2 = vis.draw_points(img, np.array([[5, 5], [20, 20]]), np.array([1, 0]))
    assert (out2[5, 5] == (0, 200, 0)).all()
    out3 = vis.draw_box(img, (2, 2, 30, 30))
    assert (out3[2, 10] == (255, 200, 0)).all()


def test_augment_pipeline(rng):
    img = (rng.random((100, 120, 3)) * 255).astype(np.float32)
    mask = (rng.random((100, 120)) > 0.5).astype(np.int32)
    aug = augment.Compose([
        augment.UniformRandomResize((0.8, 1.2)),
        augment.HorizontalFlip(p=1.0),
        augment.RandomCrop((64, 64)),
        augment.RandomBrightnessContrast(p=1.0),
    ])
    out_img, out_mask = aug(img, mask)
    assert out_img.shape == (64, 64, 3)
    assert out_mask.shape == (64, 64)


def test_gelu_dtype_policy():
    """F.gelu: exact erf at f32 (torch parity), tanh approximation at bf16
    (deviation <= 4.7e-4 absolute — below bf16 resolution at |x|>~2 and far
    below the int8 serving quantization step; nn/functional.gelu)."""
    import jax
    import jax.numpy as jnp
    from sam_quantization_tpu.nn import functional as F

    x = jnp.linspace(-6.0, 6.0, 4097, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(F.gelu(x)),
        np.asarray(jax.nn.gelu(x, approximate=False)),
    )
    xb = x.astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(F.gelu(xb), np.float32),
        np.asarray(jax.nn.gelu(xb, approximate=True), np.float32),
    )
    # the bf16 fast path stays within 5e-4 of the exact-erf value
    diff = np.abs(
        np.asarray(F.gelu(xb), np.float32)
        - np.asarray(jax.nn.gelu(x, approximate=False), np.float32)
    )
    # bf16 rounding of the input alone contributes up to ~2^-8 * |x|
    assert diff.max() <= 5e-4 + np.abs(np.asarray(x)) .max() * 2**-8
