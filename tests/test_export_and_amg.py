"""StableHLO export round-trip + AMG end-to-end on the tiny model."""

import numpy as np
import jax
import jax.numpy as jnp

from sam_quantization_tpu.models import sam as sam_lib
from sam_quantization_tpu.models.configs import VIT_TINY


def test_export_decoder_roundtrip(tmp_path, rng):
    model = sam_lib.init(jax.random.PRNGKey(0), VIT_TINY)
    from sam_quantization_tpu import export

    path = str(tmp_path / "decoder.stablehlo")
    export.export_decoder(model, path, num_points=4)
    fn = export.load_exported(path)
    h, w = VIT_TINY.prompt_encoder.image_embedding_size
    d = VIT_TINY.prompt_encoder.embed_dim
    emb = jnp.asarray(rng.normal(size=(1, h, w, d)).astype(np.float32))
    coords = jnp.zeros((1, 4, 2), jnp.float32)
    labels = -jnp.ones((1, 4), jnp.float32).at[0, 0].set(1.0)
    mask_in = jnp.zeros((1, 4 * h, 4 * w, 1), jnp.float32)
    masks, iou, low = fn(emb, coords, labels, mask_in, jnp.zeros((1,), jnp.float32))
    assert masks.shape[0] == 1 and masks.shape[1] == 1
    # matches direct module call
    mod = export.SamDecoderModule(model)
    m2, i2, l2 = mod(emb, coords, labels, mask_in, jnp.zeros((1,), jnp.float32))
    np.testing.assert_allclose(np.asarray(masks), np.asarray(m2), rtol=1e-4, atol=1e-4)


def test_amg_generate_tiny(rng):
    from sam_quantization_tpu.automatic_mask_generator import SamAutomaticMaskGenerator

    model = sam_lib.init(jax.random.PRNGKey(0), VIT_TINY)
    gen = SamAutomaticMaskGenerator(
        model,
        points_per_side=4,
        points_per_batch=16,
        pred_iou_thresh=-1e9,       # random model: keep everything
        stability_score_thresh=0.0,
        min_mask_region_area=0,
        attn_impl="xla",
    )
    img = (rng.random((96, 80, 3)) * 255).astype(np.uint8)
    anns = gen.generate(img)
    assert isinstance(anns, list)
    for a in anns[:3]:
        assert a["segmentation"].shape == (96, 80)
        assert "bbox" in a and "predicted_iou" in a and "stability_score" in a


def test_points_sampler(rng):
    from sam_quantization_tpu.data.points_sampler import (
        MultiPointSampler, points_to_sam_prompts,
    )

    inst = np.zeros((64, 64), np.int32)
    inst[10:30, 10:30] = 1
    inst[40:60, 40:60] = 2
    s = MultiPointSampler(max_num_points=6, first_click_center=True)
    s.sample_object(inst, [1, 2])
    pts = s.sample_points()
    assert pts.shape == (12, 3)
    coords, labels = points_to_sam_prompts(pts, 12)
    assert coords.shape == (12, 2) and labels.shape == (12,)
    # positive clicks land inside the selected object
    sel = s.selected_mask > 0
    n = 6
    for i, (y, x, _) in enumerate(pts[:n]):
        if y >= 0:
            assert sel[int(y), int(x)]


def test_amg_with_mesh(rng):
    """AMG prompt batches shard over a dp mesh axis."""
    from sam_quantization_tpu.automatic_mask_generator import SamAutomaticMaskGenerator
    from sam_quantization_tpu.parallel import mesh as mesh_lib

    model = sam_lib.init(jax.random.PRNGKey(0), VIT_TINY)
    mesh = mesh_lib.make_mesh(4, tp=1)
    gen = SamAutomaticMaskGenerator(
        model, points_per_side=4, points_per_batch=16,
        pred_iou_thresh=-1e9, stability_score_thresh=0.0,
        attn_impl="xla", mesh=mesh,
    )
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    anns = gen.generate(img)
    assert isinstance(anns, list)
