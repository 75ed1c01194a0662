"""FQ-quantizable ViT/DeiT image classifiers.

Capability counterpart of the reference's original FQ-ViT ImageNet models
(fq_vit/models/vit_quant.py:25-548, layers_quant.py:14-296 — kept in that
repo "for completeness" alongside the SAM path). Same functional design as
the SAM encoder: params are pytrees, FQ observation points are ctx hooks at
the positions of the reference's QAct modules, so the full PTQ pipeline
(PTF int-LN + LIS) applies unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from sam_quantization_tpu.nn import functional as F
from sam_quantization_tpu.quant.context import NULL_CTX


@dataclasses.dataclass(frozen=True)
class ViTClassifierConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    distilled: bool = False  # DeiT distillation token

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def num_prefix_tokens(self) -> int:
        return 2 if self.distilled else 1

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


VIT_B_224 = ViTClassifierConfig()
VIT_L_224 = ViTClassifierConfig(embed_dim=1024, depth=24, num_heads=16)
DEIT_T_224 = ViTClassifierConfig(embed_dim=192, depth=12, num_heads=3, distilled=True)
DEIT_S_224 = ViTClassifierConfig(embed_dim=384, depth=12, num_heads=6, distilled=True)
DEIT_B_224 = ViTClassifierConfig(embed_dim=768, depth=12, num_heads=12, distilled=True)

CLASSIFIER_CONFIGS = {
    "vit_base": VIT_B_224,
    "vit_large": VIT_L_224,
    "deit_tiny": DEIT_T_224,
    "deit_small": DEIT_S_224,
    "deit_base": DEIT_B_224,
}


def init(key: jax.Array, cfg: ViTClassifierConfig) -> dict:
    ks = jax.random.split(key, cfg.depth + 6)
    d = cfg.embed_dim
    params = {
        "patch_embed": F.init_conv2d(ks[0], cfg.patch_size, cfg.patch_size,
                                     cfg.in_chans, d),
        "cls_token": jnp.zeros((1, 1, d), jnp.float32),
        "pos_embed": jax.random.normal(
            ks[1], (1, cfg.num_patches + cfg.num_prefix_tokens, d)
        ) * 0.02,
        "norm": F.init_layer_norm(d),
        "head": F.init_linear(ks[2], d, cfg.num_classes),
        "blocks": [],
    }
    if cfg.distilled:
        params["dist_token"] = jnp.zeros((1, 1, d), jnp.float32)
        params["head_dist"] = F.init_linear(ks[3], d, cfg.num_classes)
    for i in range(cfg.depth):
        k1, k2, k3, k4 = jax.random.split(ks[4 + i], 4)
        params["blocks"].append({
            "norm1": F.init_layer_norm(d),
            "attn": {
                "qkv": F.init_linear(k1, d, 3 * d),
                "proj": F.init_linear(k2, d, d),
            },
            "norm2": F.init_layer_norm(d),
            "mlp": {
                "lin1": F.init_linear(k3, d, cfg.mlp_dim),
                "lin2": F.init_linear(k4, cfg.mlp_dim, d),
            },
        })
    return params


def _attention(p, x, cfg, ctx, path):
    """Observation points mirror fq_vit vit_quant.py Attention (qact after
    qkv, after softmax-input, log-int-softmax, after attn·v, after proj)."""
    B, L, C = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    qkv = ctx.linear(f"{path}.qkv", p["qkv"], x)
    qkv = ctx.act(f"{path}.qact1", qkv)
    qkv = qkv.reshape(B, L, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jnp.einsum(
        "bhqc,bhkc->bhqk", q * (hd**-0.5), k, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    attn = ctx.act(f"{path}.qact_attn1", attn)
    attn = ctx.softmax(f"{path}.softmax", attn, scale_path=f"{path}.qact_attn1")
    out = jnp.einsum("bhqk,bhkc->bhqc", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, L, C)
    out = ctx.act(f"{path}.qact2", out)
    out = ctx.linear(f"{path}.proj", p["proj"], out)
    return ctx.act(f"{path}.qact3", out)


def apply(
    p: dict, x: jax.Array, cfg: ViTClassifierConfig, ctx=NULL_CTX
) -> jax.Array | Tuple[jax.Array, jax.Array]:
    """(B, H, W, 3) → (B, num_classes) logits (mean of heads for DeiT)."""
    B = x.shape[0]
    x = ctx.conv2d("patch_embed", p["patch_embed"], x, stride=cfg.patch_size)
    x = x.reshape(B, -1, cfg.embed_dim)
    tokens = [jnp.broadcast_to(p["cls_token"], (B, 1, cfg.embed_dim))]
    if cfg.distilled:
        tokens.append(jnp.broadcast_to(p["dist_token"], (B, 1, cfg.embed_dim)))
    x = jnp.concatenate(tokens + [x], axis=1)
    x = x + p["pos_embed"].astype(x.dtype)
    x = ctx.act("qact_embed", x, ln_input=True)

    for i, blk in enumerate(p["blocks"]):
        path = f"blocks.{i}"
        in_path = f"blocks.{i - 1}.qact4" if i > 0 else "qact_embed"
        h = ctx.layer_norm(f"{path}.norm1", blk["norm1"], x, cfg.ln_eps,
                           in_path=in_path, out_path=f"{path}.qact1")
        h = ctx.act(f"{path}.qact1", h)
        x = ctx.act(f"{path}.qact2", x + _attention(blk["attn"], h, cfg, ctx,
                                                    f"{path}.attn"), ln_input=True)
        h = ctx.layer_norm(f"{path}.norm2", blk["norm2"], x, cfg.ln_eps,
                           in_path=f"{path}.qact2", out_path=f"{path}.qact3")
        h = ctx.act(f"{path}.qact3", h)
        h = ctx.linear(f"{path}.mlp.lin1", blk["mlp"]["lin1"], h)
        h = F.gelu(h)
        h = ctx.act(f"{path}.mlp.qact1", h)
        h = ctx.linear(f"{path}.mlp.lin2", blk["mlp"]["lin2"], h)
        h = ctx.act(f"{path}.mlp.qact2", h)
        x = ctx.act(f"{path}.qact4", x + h, ln_input=True)

    last = f"blocks.{cfg.depth - 1}.qact4"
    x = ctx.layer_norm("norm", p["norm"], x, cfg.ln_eps,
                       in_path=last, out_path="qact_out")
    x = ctx.act("qact_out", x)
    logits = ctx.linear("head", p["head"], x[:, 0])
    if cfg.distilled:
        logits_dist = ctx.linear("head_dist", p["head_dist"], x[:, 1])
        return (logits + logits_dist) / 2.0
    return logits


def calibrate_classifier(params, cfg, fqcfg, batches):
    """FQ calibration driver for the classifier (test_quant.py counterpart)."""
    import functools

    from sam_quantization_tpu.quant.fq.pipeline import FQCtx

    @functools.partial(jax.jit, static_argnames=("mode",))
    def step(params, x, state, mode):
        ctx = FQCtx(mode, fqcfg, state)
        apply(params, x, cfg, ctx)
        return {**state, **ctx.updates}, ctx.new_qparams

    batches = list(batches)
    state, qparams = {}, {}
    for i, x in enumerate(batches):
        mode = "last_calib" if i == len(batches) - 1 else "calib"
        state, qparams = step(params, x, state, mode)
    return qparams
