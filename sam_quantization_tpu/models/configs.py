"""Static model configurations for SAM variants.

Mirrors the capability surface of the reference registry
(``/root/reference/segment_anything/build_sam.py:14-107``): ViT-B/L/H image
encoders (window size 14, four global-attention blocks), a 256-dim prompt
embedding space, a 2-layer TwoWayTransformer mask decoder, and 1024px inputs.

Unlike the reference fork — which hard-codes ViT-H window math
(``image_encoder.py:297-305``) — everything here is parameterized, so any
(img_size, patch, window) combination traces and compiles.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ImageEncoderConfig:
    """ViTDet-style image encoder (ref: segment_anything/modeling/image_encoder.py:17-118)."""

    img_size: int = 1024
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    qkv_bias: bool = True
    use_abs_pos: bool = True
    use_rel_pos: bool = True
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    ln_eps: float = 1e-6

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)

    def block_window(self, i: int) -> int:
        """Window size for block i (0 = global attention)."""
        return 0 if i in self.global_attn_indexes else self.window_size

    def block_input_size(self, i: int) -> Tuple[int, int]:
        w = self.block_window(i)
        if w == 0:
            return (self.grid_size, self.grid_size)
        return (w, w)


@dataclasses.dataclass(frozen=True)
class PromptEncoderConfig:
    """ref: segment_anything/modeling/prompt_encoder.py:16-62."""

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    ln_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class TwoWayTransformerConfig:
    """ref: segment_anything/modeling/transformer.py:16-60."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    ln_eps: float = 1e-5


@dataclasses.dataclass(frozen=True)
class MaskDecoderConfig:
    """ref: segment_anything/modeling/mask_decoder.py:16-70."""

    transformer_dim: int = 256
    transformer: TwoWayTransformerConfig = TwoWayTransformerConfig()
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    ln_eps: float = 1e-6

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1


@dataclasses.dataclass(frozen=True)
class SamConfig:
    """Full SAM model config (ref: segment_anything/build_sam.py:55-107)."""

    image_encoder: ImageEncoderConfig = ImageEncoderConfig()
    prompt_encoder: PromptEncoderConfig = PromptEncoderConfig()
    mask_decoder: MaskDecoderConfig = MaskDecoderConfig()
    pixel_mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    mask_threshold: float = 0.0


def _encoder(embed_dim, depth, num_heads, global_attn, **kw) -> ImageEncoderConfig:
    return ImageEncoderConfig(
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        global_attn_indexes=tuple(global_attn),
        **kw,
    )


# Registry configs (ref: segment_anything/build_sam.py:14-52).
VIT_B = SamConfig(image_encoder=_encoder(768, 12, 12, (2, 5, 8, 11)))
VIT_L = SamConfig(image_encoder=_encoder(1024, 24, 16, (5, 11, 17, 23)))
VIT_H = SamConfig(image_encoder=_encoder(1280, 32, 16, (7, 15, 23, 31)))

# Tiny configs for tests — same topology, small dims.
VIT_TINY = SamConfig(
    image_encoder=ImageEncoderConfig(
        img_size=128,
        embed_dim=64,
        depth=4,
        num_heads=4,
        global_attn_indexes=(1, 3),
        window_size=5,
        out_chans=32,
    ),
    prompt_encoder=PromptEncoderConfig(
        embed_dim=32, image_embedding_size=(8, 8), input_image_size=(128, 128)
    ),
    mask_decoder=MaskDecoderConfig(
        transformer_dim=32,
        transformer=TwoWayTransformerConfig(embedding_dim=32, num_heads=4, mlp_dim=64),
        iou_head_hidden_dim=32,
    ),
)

CONFIGS = {
    "vit_b": VIT_B,
    "vit_l": VIT_L,
    "vit_h": VIT_H,
    "vit_tiny": VIT_TINY,
}
