"""SamPredictor: cached-embedding interactive prediction API.

Counterpart of ``segment_anything/predictor.py:17-269``. ``set_image``
resizes/normalizes and runs the image encoder once (cached); ``predict``
embeds prompts and decodes masks.

JIT discipline: prompts are padded to a fixed slot count (default 16 points)
so the decode path compiles once per (multimask, mask_input) combination —
the click loop (the reference's hot path, script/evaluation2.py:276-331)
re-uses one compiled function across all clicks.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sam_quantization_tpu.models import sam as sam_lib
from sam_quantization_tpu.quant.context import NULL_CTX
from sam_quantization_tpu.utils.transforms import ResizeLongestSide

MAX_POINTS = 24  # padded prompt slots (reference training uses 24×3 points)


@functools.lru_cache(maxsize=4)
def _encode_jit(opts_key):
    """jit keyed on the run's scoped-vmem compiler options (read lazily so
    a CLI's apply_scoped_vmem, which runs after import, is honored)."""
    return jax.jit(
        lambda model, x, attn_impl="auto": sam_lib.encode_image(
            model, sam_lib.preprocess(model, x), attn_impl=attn_impl
        ),
        static_argnames=("attn_impl",),
        compiler_options=dict(opts_key) if opts_key else None,
    )


def _encode(model, x, attn_impl="auto"):
    from sam_quantization_tpu.ops.flash_attention import (
        scoped_vmem_compiler_options,
    )

    opts = scoped_vmem_compiler_options()
    key = tuple(sorted(opts.items())) if opts else None
    return _encode_jit(key)(model, x, attn_impl)


@functools.partial(
    jax.jit, static_argnames=("multimask", "with_mask", "with_box", "with_points")
)
def _decode(
    model, emb, coords, labels, boxes, mask_input, mask_valid, multimask,
    with_mask, with_box, with_points=True,
):
    return sam_lib.decode_masks(
        model,
        emb,
        points=(coords, labels) if with_points else None,
        boxes=boxes if with_box else None,
        mask_inputs=mask_input if with_mask else None,
        mask_valid=mask_valid if with_mask else None,
        multimask_output=multimask,
    )


class SamPredictor:
    def __init__(self, model: sam_lib.Sam, ctx=NULL_CTX, attn_impl: str = "auto"):
        self.model = model
        self.ctx = ctx
        self.attn_impl = attn_impl
        self.transform = ResizeLongestSide(model.config.image_encoder.img_size)
        self.reset_image()

    # -- image ------------------------------------------------------------

    def reset_image(self):
        self.features = None
        self.original_size: Optional[Tuple[int, int]] = None
        self.input_size: Optional[Tuple[int, int]] = None
        self.is_image_set = False

    def set_image(self, image: np.ndarray, image_format: str = "RGB"):
        """(H, W, 3) uint8 image → cached embedding (ref predictor.py:36-65)."""
        assert image_format in ("RGB", "BGR")
        if image_format == "BGR":
            image = image[..., ::-1]
        self.original_size = image.shape[:2]
        resized = self.transform.apply_image(image)
        self.input_size = resized.shape[:2]
        x = jnp.asarray(resized)[None]
        self.features = _encode(self.model, x, self.attn_impl)
        self.is_image_set = True
        return self.features

    def set_torch_image(self, image):  # API parity alias
        raise NotImplementedError("use set_image with a numpy array")

    # -- predict ----------------------------------------------------------

    def predict(
        self,
        point_coords: Optional[np.ndarray] = None,
        point_labels: Optional[np.ndarray] = None,
        box: Optional[np.ndarray] = None,
        mask_input: Optional[np.ndarray] = None,
        multimask_output: bool = True,
        return_logits: bool = False,
    ):
        """Predict masks for prompts in the *original* image frame
        (ref predictor.py:84-180). Returns (masks, iou_predictions,
        low_res_logits) as numpy arrays with the reference's shapes."""
        assert self.is_image_set, "call set_image first"
        coords = np.zeros((1, MAX_POINTS, 2), np.float32)
        labels = -np.ones((1, MAX_POINTS), np.float32)
        n = 0
        if point_coords is not None:
            pc = self.transform.apply_coords(point_coords, self.original_size)
            n = pc.shape[0]
            coords[0, :n] = pc
            labels[0, :n] = point_labels
        boxes_j = jnp.zeros((1, 4), jnp.float32)
        if box is not None:
            # real box path: corner embeddings via the prompt encoder's
            # _embed_boxes, and (matching the reference) no padding point is
            # appended when a box is present (prompt_encoder.py:83-92, 157-160)
            b = self.transform.apply_boxes(box.reshape(1, 4), self.original_size)
            boxes_j = jnp.asarray(b, jnp.float32)

        with_mask = mask_input is not None
        if with_mask:
            mi = jnp.asarray(mask_input, jnp.float32).reshape(
                1, *mask_input.shape[-2:], 1
            )
            mv = jnp.ones((1,), bool)
        else:
            h, w = self.model.config.prompt_encoder.image_embedding_size
            mi = jnp.zeros((1, 4 * h, 4 * w, 1), jnp.float32)
            mv = jnp.zeros((1,), bool)

        low_res, iou = _decode(
            self.model,
            self.features,
            jnp.asarray(coords),
            jnp.asarray(labels),
            boxes_j,
            mi,
            mv,
            multimask_output,
            with_mask,
            box is not None,
            point_coords is not None or box is None,
        )
        masks = sam_lib.postprocess_masks(
            self.model, low_res, self.input_size, self.original_size
        )
        masks = np.asarray(masks[0])
        if not return_logits:
            masks = masks > self.model.mask_threshold
        return masks, np.asarray(iou[0]), np.asarray(low_res[0])

    def get_image_embedding(self):
        assert self.is_image_set
        return self.features
