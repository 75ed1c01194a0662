"""TTA / BRS predictor tests on the tiny model."""

import numpy as np
import jax

from sam_quantization_tpu.evaluation.clicker import Clicker
from sam_quantization_tpu.evaluation.predictors import (
    FeatureBRSPredictor, InputBRSPredictor, SamEvalPredictor, ZoomIn,
)
from sam_quantization_tpu.models import sam as sam_lib
from sam_quantization_tpu.models.configs import VIT_TINY
from sam_quantization_tpu.predictor import SamPredictor


def _scene(rng, size):
    img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
    gt = np.zeros((size, size), np.int32)
    gt[40:90, 30:80] = 1
    return img, gt


def _run(pred_cls, rng, **kw):
    model = sam_lib.init(jax.random.PRNGKey(0), VIT_TINY)
    base = SamPredictor(model, attn_impl="xla")
    p = pred_cls(base, **kw)
    size = VIT_TINY.image_encoder.img_size
    img, gt = _scene(rng, size)
    p.set_input_image(img)
    clicker = Clicker(gt_mask=gt)
    clicker.make_next_click(np.zeros_like(gt, bool))
    prob = p.get_prediction(clicker)
    assert prob.shape == (size, size)
    assert np.isfinite(prob).all()
    assert (prob >= 0).all() and (prob <= 1).all()
    return prob


def test_eval_predictor_plain(rng):
    _run(SamEvalPredictor, rng)


def test_eval_predictor_flip(rng):
    _run(SamEvalPredictor, rng, with_flip=True)


def test_eval_predictor_zoom(rng):
    model = sam_lib.init(jax.random.PRNGKey(0), VIT_TINY)
    base = SamPredictor(model, attn_impl="xla")
    size = VIT_TINY.image_encoder.img_size
    p = SamEvalPredictor(base, zoom_in=ZoomIn(skip_clicks=0))
    img, gt = _scene(rng, size)
    p.set_input_image(img)
    clicker = Clicker(gt_mask=gt)
    clicker.make_next_click(np.zeros_like(gt, bool))
    clicker.make_next_click(np.zeros_like(gt, bool))
    prob = p.get_prediction(clicker)
    assert np.isfinite(prob).all()


def test_crops_offsets_math():
    """Offsets cover the axis with >= min_overlap and end flush (ref
    crops.py get_offsets:81-103)."""
    from sam_quantization_tpu.evaluation.predictors import _axis_offsets

    offs = _axis_offsets(500, 320, 0.2)
    assert offs[0] == 0 and offs[-1] == 500 - 320
    assert all(o2 - o1 <= 320 for o1, o2 in zip(offs, offs[1:]))
    assert _axis_offsets(320, 320, 0.2) == [0]


def test_eval_predictor_crops(rng):
    """Tiled-crop TTA: per-crop predictions average into the full frame."""
    from sam_quantization_tpu.evaluation.predictors import Crops

    model = sam_lib.init(jax.random.PRNGKey(0), VIT_TINY)
    base = SamPredictor(model, attn_impl="xla")
    size = VIT_TINY.image_encoder.img_size  # 128
    p = SamEvalPredictor(base, crops=Crops(crop_size=(96, 96), min_overlap=0.2))
    img, gt = _scene(rng, size)
    p.set_input_image(img)
    assert len(p._crop_preds) == 4  # 2x2 tiling of 128^2 by 96^2
    clicker = Clicker(gt_mask=gt)
    clicker.make_next_click(np.zeros_like(gt, bool))
    prob = p.get_prediction(clicker)
    assert prob.shape == (size, size)
    assert np.isfinite(prob).all() and (prob >= 0).all() and (prob <= 1).all()
    # a crop-size image deactivates crops entirely
    p2 = SamEvalPredictor(base, crops=Crops(crop_size=(size, size)))
    p2.set_input_image(img)
    assert len(p2._crop_preds) == 1


def test_input_brs(rng):
    _run(InputBRSPredictor, rng, opt_steps=2)


def test_feature_brs(rng):
    _run(FeatureBRSPredictor, rng, opt_steps=2)


def test_noc_eval_predictor_loop(rng):
    """Predictor-indirected NoC loop (TTA seam) runs end to end."""
    from sam_quantization_tpu.evaluation import click_eval

    model = sam_lib.init(jax.random.PRNGKey(0), VIT_TINY)
    base = SamPredictor(model, attn_impl="xla")
    p = SamEvalPredictor(base)
    size = VIT_TINY.image_encoder.img_size

    def samples():
        img, gt = _scene(rng, size)
        yield img, gt

    noc, over, spc = click_eval.noc_eval_predictor(p, samples(), max_clicks=2)
    assert len(noc) == 3 and all(n <= 3 for n in noc)


def test_predictor_box_prompt(rng):
    model = sam_lib.init(jax.random.PRNGKey(0), VIT_TINY)
    p = SamPredictor(model, attn_impl="xla")
    size = VIT_TINY.image_encoder.img_size
    img, gt = _scene(rng, size)
    p.set_image(img)
    masks, ious, low = p.predict(box=np.array([20.0, 30.0, 90.0, 100.0]),
                                 multimask_output=True)
    assert masks.shape == (3, size, size)
    assert np.isfinite(ious).all()
    # box + point together
    masks2, _, _ = p.predict(
        point_coords=np.array([[50.0, 60.0]]), point_labels=np.array([1.0]),
        box=np.array([20.0, 30.0, 90.0, 100.0]), multimask_output=False,
    )
    assert masks2.shape == (1, size, size)
