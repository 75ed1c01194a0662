"""TwoWayTransformer (mask-decoder core), functional JAX.

Capability counterpart of ``segment_anything/modeling/transformer.py``:
``depth`` blocks of (token self-attn, token→image cross-attn, MLP,
image→token cross-attn) with channel-downsampled attention (rate 2), plus a
final token→image attention and LayerNorm.

The FQ-ViT pipeline instruments this module too
(fq_vit/models/sam/transformer.py, 14 QActs per block); the same observation
points exist here via the ctx hooks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sam_quantization_tpu.models.configs import TwoWayTransformerConfig
from sam_quantization_tpu.nn import functional as F
from sam_quantization_tpu.quant.context import NULL_CTX


def init_attention(key, dim: int, downsample_rate: int = 1) -> dict:
    internal = dim // downsample_rate
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "q_proj": F.init_linear(k1, dim, internal),
        "k_proj": F.init_linear(k2, dim, internal),
        "v_proj": F.init_linear(k3, dim, internal),
        "out_proj": F.init_linear(k4, internal, dim),
    }


def init_block(key, cfg: TwoWayTransformerConfig) -> dict:
    ks = jax.random.split(key, 6)
    d = cfg.embedding_dim
    return {
        "self_attn": init_attention(ks[0], d),
        "norm1": F.init_layer_norm(d),
        "cross_attn_t2i": init_attention(ks[1], d, cfg.attention_downsample_rate),
        "norm2": F.init_layer_norm(d),
        "mlp": {
            "lin1": F.init_linear(ks[2], d, cfg.mlp_dim),
            "lin2": F.init_linear(ks[3], cfg.mlp_dim, d),
        },
        "norm3": F.init_layer_norm(d),
        "norm4": F.init_layer_norm(d),
        "cross_attn_i2t": init_attention(ks[4], d, cfg.attention_downsample_rate),
    }


def init(key, cfg: TwoWayTransformerConfig) -> dict:
    ks = jax.random.split(key, cfg.depth + 1)
    return {
        "layers": [init_block(ks[i], cfg) for i in range(cfg.depth)],
        "final_attn": init_attention(
            ks[-1], cfg.embedding_dim, cfg.attention_downsample_rate
        ),
        "norm_final": F.init_layer_norm(cfg.embedding_dim),
    }


def attention(
    p: dict,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    ctx=NULL_CTX,
    path: str = "attn",
) -> jax.Array:
    """Projected multi-head attention (ref transformer.py:185-240)."""
    q = ctx.linear(f"{path}.q_proj", p["q_proj"], q)
    k = ctx.linear(f"{path}.k_proj", p["k_proj"], k)
    v = ctx.linear(f"{path}.v_proj", p["v_proj"], v)
    B, Nq, C = q.shape
    Nk = k.shape[1]
    hd = C // num_heads
    qh = q.reshape(B, Nq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Nk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Nk, num_heads, hd).transpose(0, 2, 1, 3)
    attn = jnp.einsum(
        "bhqc,bhkc->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(hd))
    attn = ctx.act(f"{path}.qact_attn", attn.astype(q.dtype))
    attn = ctx.softmax(f"{path}.softmax", attn, scale_path=f"{path}.qact_attn")
    out = jnp.einsum("bhqk,bhkc->bhqc", attn, vh, preferred_element_type=jnp.float32)
    out = out.astype(q.dtype).transpose(0, 2, 1, 3).reshape(B, Nq, C)
    out = ctx.linear(f"{path}.out_proj", p["out_proj"], out)
    return out


def block_apply(
    p: dict,
    queries: jax.Array,
    keys: jax.Array,
    query_pe: jax.Array,
    key_pe: jax.Array,
    cfg: TwoWayTransformerConfig,
    skip_first_layer_pe: bool,
    ctx=NULL_CTX,
    path: str = "layer",
) -> Tuple[jax.Array, jax.Array]:
    """ref TwoWayAttentionBlock.forward (transformer.py:152-182)."""
    nh = cfg.num_heads
    if skip_first_layer_pe:
        queries = attention(
            p["self_attn"], queries, queries, queries, nh, ctx, f"{path}.self_attn"
        )
    else:
        q = queries + query_pe
        queries = queries + attention(
            p["self_attn"], q, q, queries, nh, ctx, f"{path}.self_attn"
        )
    # residual-stream observation points feed the integer LN (PTF) exactly
    # like the encoder's qact2/qact4 (fq_vit transformer.py's 14-QAct layout)
    queries = ctx.act(f"{path}.qact_res1", queries, ln_input=True)
    queries = ctx.layer_norm(
        f"{path}.norm1", p["norm1"], queries, cfg.ln_eps,
        in_path=f"{path}.qact_res1", out_path=f"{path}.qact_ln1",
    )
    queries = ctx.act(f"{path}.qact_ln1", queries)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + attention(
        p["cross_attn_t2i"], q, k, keys, nh, ctx, f"{path}.cross_attn_t2i"
    )
    queries = ctx.act(f"{path}.qact_res2", queries, ln_input=True)
    queries = ctx.layer_norm(
        f"{path}.norm2", p["norm2"], queries, cfg.ln_eps,
        in_path=f"{path}.qact_res2", out_path=f"{path}.qact_ln2",
    )
    queries = ctx.act(f"{path}.qact_ln2", queries)

    h = ctx.linear(f"{path}.mlp.lin1", p["mlp"]["lin1"], queries)
    h = jax.nn.relu(h)
    h = ctx.linear(f"{path}.mlp.lin2", p["mlp"]["lin2"], h)
    queries = queries + h
    queries = ctx.act(f"{path}.qact_res3", queries, ln_input=True)
    queries = ctx.layer_norm(
        f"{path}.norm3", p["norm3"], queries, cfg.ln_eps,
        in_path=f"{path}.qact_res3", out_path=f"{path}.qact_ln3",
    )
    queries = ctx.act(f"{path}.qact_ln3", queries)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + attention(
        p["cross_attn_i2t"], k, q, queries, nh, ctx, f"{path}.cross_attn_i2t"
    )
    keys = ctx.act(f"{path}.qact_res4", keys, ln_input=True)
    keys = ctx.layer_norm(
        f"{path}.norm4", p["norm4"], keys, cfg.ln_eps,
        in_path=f"{path}.qact_res4", out_path=f"{path}.qact_ln4",
    )
    keys = ctx.act(f"{path}.qact_ln4", keys)
    return queries, keys


def apply(
    p: dict,
    image_embedding: jax.Array,
    image_pe: jax.Array,
    point_embedding: jax.Array,
    cfg: TwoWayTransformerConfig,
    ctx=NULL_CTX,
    path: str = "transformer",
) -> Tuple[jax.Array, jax.Array]:
    """ref TwoWayTransformer.forward (transformer.py:62-106).

    image_embedding / image_pe: (B, h, w, C) NHWC. Returns (queries, keys)
    with keys as (B, h*w, C) tokens.
    """
    B, h, w, C = image_embedding.shape
    keys = image_embedding.reshape(B, h * w, C)
    key_pe = image_pe.reshape(image_pe.shape[0], h * w, C)
    key_pe = jnp.broadcast_to(key_pe, keys.shape)
    queries = point_embedding
    for i, layer in enumerate(p["layers"]):
        queries, keys = block_apply(
            layer,
            queries,
            keys,
            point_embedding,
            key_pe,
            cfg,
            skip_first_layer_pe=(i == 0),
            ctx=ctx,
            path=f"{path}.layers.{i}",
        )
    q = queries + point_embedding
    k = keys + key_pe
    attn_out = attention(
        p["final_attn"], q, k, keys, cfg.num_heads, ctx, f"{path}.final_attn"
    )
    queries = ctx.act(f"{path}.qact_res_final", queries + attn_out, ln_input=True)
    queries = ctx.layer_norm(
        f"{path}.norm_final", p["norm_final"], queries, cfg.ln_eps,
        in_path=f"{path}.qact_res_final", out_path=f"{path}.qact_ln_final",
    )
    queries = ctx.act(f"{path}.qact_ln_final", queries)
    return queries, keys
