"""Top-level SAM model: preprocess → encoder → prompts → decoder → postprocess.

Capability counterpart of ``segment_anything/modeling/sam.py``. The model is
a :class:`Sam` pytree (params + static config) with pure functions; all image
tensors are NHWC. ``postprocess_masks`` reproduces the reference's
interpolate → crop → interpolate chain (sam.py:126-174) with
``jax.image.resize`` (half-pixel centers == torch ``align_corners=False``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sam_quantization_tpu.models import image_encoder, mask_decoder, prompt_encoder
from sam_quantization_tpu.models.configs import SamConfig
from sam_quantization_tpu.quant.context import NULL_CTX


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Sam:
    """SAM parameter pytree + static config."""

    image_encoder: dict
    prompt_encoder: dict
    mask_decoder: dict
    config: SamConfig = dataclasses.field(
        metadata=dict(static=True), default_factory=SamConfig
    )

    @property
    def mask_threshold(self) -> float:
        return self.config.mask_threshold


def init(key: jax.Array, cfg: SamConfig) -> Sam:
    k1, k2, k3 = jax.random.split(key, 3)
    return Sam(
        image_encoder=image_encoder.init(k1, cfg.image_encoder),
        prompt_encoder=prompt_encoder.init(k2, cfg.prompt_encoder),
        mask_decoder=mask_decoder.init(k3, cfg.mask_decoder),
        config=cfg,
    )


def preprocess(model: Sam, x: jax.Array) -> jax.Array:
    """Normalize pixel values and pad to a square input (ref sam.py:160-174).

    x: (B, H, W, 3) NHWC uint8/float RGB image, H/W ≤ img_size.
    """
    cfg = model.config
    mean = jnp.array(cfg.pixel_mean, jnp.float32)
    std = jnp.array(cfg.pixel_std, jnp.float32)
    x = (x.astype(jnp.float32) - mean) / std
    B, H, W, C = x.shape
    size = cfg.image_encoder.img_size
    return jnp.pad(x, ((0, 0), (0, size - H), (0, size - W), (0, 0)))


def encode_image(
    model: Sam, x: jax.Array, ctx=NULL_CTX, attn_impl: str = "auto"
) -> jax.Array:
    """(B, img, img, 3) preprocessed image → (B, h, w, 256) embedding."""
    return image_encoder.apply(
        model.image_encoder, x, model.config.image_encoder, ctx, attn_impl
    )


def get_dense_pe(model: Sam) -> jax.Array:
    return prompt_encoder.get_dense_pe(
        model.prompt_encoder, model.config.prompt_encoder
    )


def decode_masks(
    model: Sam,
    image_embeddings: jax.Array,
    points: Optional[Tuple[jax.Array, jax.Array]] = None,
    boxes: Optional[jax.Array] = None,
    mask_inputs: Optional[jax.Array] = None,
    mask_valid: Optional[jax.Array] = None,
    multimask_output: bool = True,
    ctx=NULL_CTX,
) -> Tuple[jax.Array, jax.Array]:
    """Prompt-encode + decode. Returns (low_res_masks (B,N,4h,4w), iou_pred)."""
    sparse, dense = prompt_encoder.apply(
        model.prompt_encoder,
        model.config.prompt_encoder,
        points=points,
        boxes=boxes,
        masks=mask_inputs,
        mask_valid=mask_valid,
        ctx=ctx,
    )
    image_pe = get_dense_pe(model)
    return mask_decoder.apply(
        model.mask_decoder,
        model.config.mask_decoder,
        image_embeddings,
        image_pe,
        sparse,
        dense,
        multimask_output,
        ctx,
    )


def postprocess_masks(
    model: Sam,
    masks: jax.Array,
    input_size: Tuple[int, int],
    original_size: Tuple[int, int],
) -> jax.Array:
    """(B, N, 4h, 4w) low-res logits → (B, N, *original_size) (ref sam.py:126-158)."""
    size = model.config.image_encoder.img_size
    B, N = masks.shape[:2]
    m = jax.image.resize(masks, (B, N, size, size), method="bilinear")
    m = m[..., : input_size[0], : input_size[1]]
    return jax.image.resize(m, (B, N, *original_size), method="bilinear")


def forward(
    model: Sam,
    images: jax.Array,
    point_coords: jax.Array,
    point_labels: jax.Array,
    multimask_output: bool = False,
    ctx=NULL_CTX,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """End-to-end batched point-prompt forward (ref Sam.forward, sam.py:54-124).

    images: (B, H, W, 3) raw; point_coords: (B, N, 2); labels: (B, N).
    Returns (masks_logits at img_size, iou_predictions, low_res_logits).
    """
    x = preprocess(model, images)
    emb = encode_image(model, x, ctx)
    low_res, iou = decode_masks(
        model,
        emb,
        points=(point_coords, point_labels),
        multimask_output=multimask_output,
        ctx=ctx,
    )
    size = model.config.image_encoder.img_size
    B, N = low_res.shape[:2]
    masks = jax.image.resize(low_res, (B, N, size, size), method="bilinear")
    return masks, iou, low_res
