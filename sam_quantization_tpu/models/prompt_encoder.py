"""SAM prompt encoder, functional JAX.

Capability counterpart of ``segment_anything/modeling/prompt_encoder.py``:
random-Fourier positional encoding, point/box/mask prompt embedding, and the
``no_mask_embed`` fallback.

JIT-first differences from the reference: prompts are fixed-shape, padded
tensors — points carry a label channel where ``-1`` marks padding (exactly
the reference's pad semantics, prompt_encoder.py:83-92), masks are selected by
a static flag rather than ``None`` branching, so one compiled function serves
every click count in the interactive loop.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sam_quantization_tpu.models.configs import PromptEncoderConfig
from sam_quantization_tpu.nn import functional as F


def init(key: jax.Array, cfg: PromptEncoderConfig) -> dict:
    ks = jax.random.split(key, 10)
    d = cfg.embed_dim
    mc = cfg.mask_in_chans
    return {
        # (2, d/2) gaussian matrix (ref PositionEmbeddingRandom, :188-192)
        "pe_gaussian": jax.random.normal(ks[0], (2, d // 2), jnp.float32),
        # 4 point embeddings: neg, pos, box tl, box br (ref :45-47)
        "point_embeddings": jax.random.normal(ks[1], (4, d), jnp.float32),
        "not_a_point_embed": jax.random.normal(ks[2], (1, d), jnp.float32),
        "no_mask_embed": jax.random.normal(ks[3], (1, d), jnp.float32),
        "mask_downscaling": {
            "conv1": F.init_conv2d(ks[4], 2, 2, 1, mc // 4),
            "ln1": F.init_layer_norm(mc // 4),
            "conv2": F.init_conv2d(ks[5], 2, 2, mc // 4, mc),
            "ln2": F.init_layer_norm(mc),
            "conv3": F.init_conv2d(ks[6], 1, 1, mc, d),
        },
    }


def _pe_encoding(p: dict, coords: jax.Array) -> jax.Array:
    """Encode [0,1]-normalized coords (..., 2) → (..., embed_dim).
    ref prompt_encoder.py:193-200."""
    coords = 2.0 * coords - 1.0
    coords = coords.astype(jnp.float32) @ p["pe_gaussian"]
    coords = 2.0 * np.pi * coords
    return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)


def get_dense_pe(p: dict, cfg: PromptEncoderConfig) -> jax.Array:
    """Dense PE grid, (1, H, W, embed_dim) NHWC (ref get_dense_pe, :63-72)."""
    h, w = cfg.image_embedding_size
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h, w, 2) [x, y]
    return _pe_encoding(p, grid)[None]


def embed_points(
    p: dict,
    cfg: PromptEncoderConfig,
    coords: jax.Array,
    labels: jax.Array,
    pad: bool = True,
) -> jax.Array:
    """(B, N, 2) pixel coords + (B, N) labels → (B, N(+1), embed_dim).

    Labels: 1 positive, 0 negative, -1 padding (ref _embed_points, :74-92).
    """
    coords = coords + 0.5
    if pad:
        B = coords.shape[0]
        coords = jnp.concatenate([coords, jnp.zeros((B, 1, 2), coords.dtype)], axis=1)
        labels = jnp.concatenate([labels, -jnp.ones((B, 1), labels.dtype)], axis=1)
    h, w = cfg.input_image_size
    norm = coords / jnp.array([w, h], jnp.float32)
    pe = _pe_encoding(p, norm)
    lab = labels[..., None]
    pe = jnp.where(lab == -1, 0.0, pe)
    pe = pe + jnp.where(lab == -1, p["not_a_point_embed"][0], 0.0)
    pe = pe + jnp.where(lab == 0, p["point_embeddings"][0], 0.0)
    pe = pe + jnp.where(lab == 1, p["point_embeddings"][1], 0.0)
    # labels 2/3: box corner slots (lets fixed-shape callers pass boxes
    # through the padded point tensor; ref uses _embed_boxes for these)
    pe = pe + jnp.where(lab == 2, p["point_embeddings"][2], 0.0)
    pe = pe + jnp.where(lab == 3, p["point_embeddings"][3], 0.0)
    return pe


def embed_boxes(p: dict, cfg: PromptEncoderConfig, boxes: jax.Array) -> jax.Array:
    """(B, 4) boxes → (B, 2, embed_dim) corner embeddings (ref :94-101)."""
    boxes = boxes + 0.5
    corners = boxes.reshape(-1, 2, 2)
    h, w = cfg.input_image_size
    norm = corners / jnp.array([w, h], jnp.float32)
    pe = _pe_encoding(p, norm)
    pe = pe.at[:, 0, :].add(p["point_embeddings"][2])
    pe = pe.at[:, 1, :].add(p["point_embeddings"][3])
    return pe


def embed_masks(p: dict, cfg: PromptEncoderConfig, masks: jax.Array, ctx=None) -> jax.Array:
    """(B, 4h, 4w, 1) NHWC mask logits → (B, h, w, embed_dim) (ref :103-106).

    Both downscaling LN2ds route through the ctx hook so FQ's integer LN
    reaches them (QIntLayerNorm2D counterpart, fq_vit/models/sam/common.py)."""
    from sam_quantization_tpu.quant.context import NULL_CTX

    ctx = ctx or NULL_CTX
    md = p["mask_downscaling"]
    x = ctx.conv2d("prompt_encoder.mask_conv1", md["conv1"], masks, stride=2)
    x = ctx.act("prompt_encoder.qact_mln1_in", x, ln_input=True)
    x = ctx.layer_norm(
        "prompt_encoder.mask_ln1", md["ln1"], x, cfg.ln_eps,
        in_path="prompt_encoder.qact_mln1_in", out_path="prompt_encoder.qact_mln1",
    )
    x = ctx.act("prompt_encoder.qact_mln1", x)
    x = F.gelu(x)
    x = ctx.conv2d("prompt_encoder.mask_conv2", md["conv2"], x, stride=2)
    x = ctx.act("prompt_encoder.qact_mln2_in", x, ln_input=True)
    x = ctx.layer_norm(
        "prompt_encoder.mask_ln2", md["ln2"], x, cfg.ln_eps,
        in_path="prompt_encoder.qact_mln2_in", out_path="prompt_encoder.qact_mln2",
    )
    x = ctx.act("prompt_encoder.qact_mln2", x)
    x = F.gelu(x)
    return ctx.conv2d("prompt_encoder.mask_conv3", md["conv3"], x, stride=1)


def no_mask_dense(p: dict, cfg: PromptEncoderConfig, batch: int) -> jax.Array:
    h, w = cfg.image_embedding_size
    return jnp.broadcast_to(
        p["no_mask_embed"].reshape(1, 1, 1, -1), (batch, h, w, cfg.embed_dim)
    )


def apply(
    p: dict,
    cfg: PromptEncoderConfig,
    points: Optional[Tuple[jax.Array, jax.Array]] = None,
    boxes: Optional[jax.Array] = None,
    masks: Optional[jax.Array] = None,
    mask_valid: Optional[jax.Array] = None,
    ctx=None,
) -> Tuple[jax.Array, jax.Array]:
    """Sparse (B, N, d) + dense (B, h, w, d) prompt embeddings.

    ``masks`` may be passed together with a per-batch boolean ``mask_valid``
    so the interactive click loop (mask prompt only from click 2,
    script/evaluation2.py:301-306) compiles once: invalid rows fall back to
    ``no_mask_embed``.
    """
    parts = []
    bs = 1
    if points is not None:
        coords, labels = points
        bs = coords.shape[0]
        parts.append(embed_points(p, cfg, coords, labels, pad=boxes is None))
    if boxes is not None:
        bs = boxes.shape[0]
        parts.append(embed_boxes(p, cfg, boxes))
    sparse = (
        jnp.concatenate(parts, axis=1)
        if parts
        else jnp.zeros((bs, 0, cfg.embed_dim), jnp.float32)
    )
    if masks is not None:
        dense = embed_masks(p, cfg, masks, ctx=ctx)
        if mask_valid is not None:
            dense = jnp.where(
                mask_valid.reshape(-1, 1, 1, 1), dense, no_mask_dense(p, cfg, bs)
            )
    else:
        dense = no_mask_dense(p, cfg, bs)
    return sparse, dense
