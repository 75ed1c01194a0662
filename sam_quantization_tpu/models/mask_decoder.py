"""SAM mask decoder, functional JAX.

Capability counterpart of ``segment_anything/modeling/mask_decoder.py``:
iou/mask tokens + TwoWayTransformer, 2× transposed-conv upscaling,
per-mask-token hypernetwork MLPs, and the IoU prediction head.

TPU notes: the hypernetwork MLP stack is applied as one batched einsum over
all mask tokens (the reference loops per token, mask_decoder.py:136-141);
upscaling uses the einsum-form transposed conv from ``nn/functional.py``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sam_quantization_tpu.models import transformer
from sam_quantization_tpu.models.configs import MaskDecoderConfig
from sam_quantization_tpu.nn import functional as F
from sam_quantization_tpu.quant.context import NULL_CTX


def init_mlp(key, in_dim, hidden, out_dim, num_layers) -> dict:
    dims = [in_dim] + [hidden] * (num_layers - 1) + [out_dim]
    ks = jax.random.split(key, num_layers)
    return {
        "layers": [
            F.init_linear(ks[i], dims[i], dims[i + 1]) for i in range(num_layers)
        ]
    }


def mlp_apply(p, x, sigmoid_output=False, ctx=None, path=""):
    n = len(p["layers"])
    for i, layer in enumerate(p["layers"]):
        if ctx is not None:
            x = ctx.linear(f"{path}.layers.{i}", layer, x)
        else:
            x = F.linear(layer, x)
        if i < n - 1:
            x = jax.nn.relu(x)
    if sigmoid_output:
        x = jax.nn.sigmoid(x)
    return x


def init(key, cfg: MaskDecoderConfig) -> dict:
    ks = jax.random.split(key, cfg.num_mask_tokens + 6)
    d = cfg.transformer_dim
    return {
        "transformer": transformer.init(ks[0], cfg.transformer),
        "iou_token": jax.random.normal(ks[1], (1, d), jnp.float32),
        "mask_tokens": jax.random.normal(ks[2], (cfg.num_mask_tokens, d), jnp.float32),
        "output_upscaling": {
            "convt1": F.init_conv2d(ks[3], 2, 2, d, d // 4),
            "ln": F.init_layer_norm(d // 4),
            "convt2": F.init_conv2d(ks[4], 2, 2, d // 4, d // 8),
        },
        "hypernetworks": [
            init_mlp(ks[5 + i], d, d, d // 8, 3) for i in range(cfg.num_mask_tokens)
        ],
        "iou_head": init_mlp(
            ks[5 + cfg.num_mask_tokens], d, cfg.iou_head_hidden_dim,
            cfg.num_mask_tokens, cfg.iou_head_depth,
        ),
    }


def predict_masks(
    p: dict,
    cfg: MaskDecoderConfig,
    image_embeddings: jax.Array,
    image_pe: jax.Array,
    sparse_prompt_embeddings: jax.Array,
    dense_prompt_embeddings: jax.Array,
    ctx=NULL_CTX,
) -> Tuple[jax.Array, jax.Array]:
    """ref MaskDecoder.predict_masks (mask_decoder.py:113-151).

    image_embeddings: (1 or B, h, w, C) NHWC; dense prompts (B, h, w, C);
    sparse prompts (B, N, C). Returns masks (B, num_mask_tokens, 4h, 4w) and
    iou predictions (B, num_mask_tokens).
    """
    B = sparse_prompt_embeddings.shape[0]
    d = cfg.transformer_dim
    output_tokens = jnp.concatenate([p["iou_token"], p["mask_tokens"]], axis=0)
    output_tokens = jnp.broadcast_to(output_tokens[None], (B, *output_tokens.shape))
    tokens = jnp.concatenate(
        [output_tokens, sparse_prompt_embeddings.astype(output_tokens.dtype)], axis=1
    )

    src = jnp.broadcast_to(
        image_embeddings, (B, *image_embeddings.shape[1:])
    ) + dense_prompt_embeddings.astype(image_embeddings.dtype)
    _, h, w, c = src.shape

    hs, src = transformer.apply(
        p["transformer"], src, image_pe, tokens, cfg.transformer, ctx
    )
    iou_token_out = hs[:, 0, :]
    mask_tokens_out = hs[:, 1 : 1 + cfg.num_mask_tokens, :]

    src = src.reshape(B, h, w, c)
    up = p["output_upscaling"]
    x = ctx.conv_transpose2d("mask_decoder.convt1", up["convt1"], src, stride=2)
    # upscaling LN2d through the ctx hook (QIntLayerNorm2D counterpart,
    # fq_vit/models/sam/common.py:91-148) — channels-last makes it a plain
    # last-axis integer LN
    x = ctx.act("mask_decoder.qact_up_ln_in", x, ln_input=True)
    x = ctx.layer_norm(
        "mask_decoder.up_ln", up["ln"], x, cfg.ln_eps,
        in_path="mask_decoder.qact_up_ln_in", out_path="mask_decoder.qact_up_ln",
    )
    x = ctx.act("mask_decoder.qact_up_ln", x)
    x = F.gelu(x)
    x = ctx.act("mask_decoder.qact_up1", x)
    x = ctx.conv_transpose2d("mask_decoder.convt2", up["convt2"], x, stride=2)
    upscaled = ctx.act("mask_decoder.qact_up2", F.gelu(x))  # (B, 4h, 4w, d//8)

    hyper_in = jnp.stack(
        [
            mlp_apply(
                p["hypernetworks"][i], mask_tokens_out[:, i, :],
                ctx=ctx, path=f"mask_decoder.hyper.{i}",
            )
            for i in range(cfg.num_mask_tokens)
        ],
        axis=1,
    )  # (B, num_mask_tokens, d//8)
    masks = jnp.einsum(
        "bnc,bhwc->bnhw", hyper_in, upscaled, preferred_element_type=jnp.float32
    ).astype(upscaled.dtype)
    iou_pred = mlp_apply(p["iou_head"], iou_token_out, ctx=ctx, path="mask_decoder.iou_head")
    return masks, iou_pred


def apply(
    p: dict,
    cfg: MaskDecoderConfig,
    image_embeddings: jax.Array,
    image_pe: jax.Array,
    sparse_prompt_embeddings: jax.Array,
    dense_prompt_embeddings: jax.Array,
    multimask_output: bool,
    ctx=NULL_CTX,
) -> Tuple[jax.Array, jax.Array]:
    """ref MaskDecoder.forward (mask_decoder.py:72-111)."""
    masks, iou_pred = predict_masks(
        p, cfg, image_embeddings, image_pe,
        sparse_prompt_embeddings, dense_prompt_embeddings, ctx,
    )
    if multimask_output:
        return masks[:, 1:], iou_pred[:, 1:]
    return masks[:, :1], iou_pred[:, :1]
