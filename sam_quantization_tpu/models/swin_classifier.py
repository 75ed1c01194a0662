"""FQ-quantizable Swin Transformer classifier.

Capability counterpart of the reference's fq_vit Swin models
(fq_vit/models/swin_quant.py:19-901): 4-stage hierarchy with patch merging,
shifted-window attention with learned relative-position-bias tables, and the
same FQ observation-point protocol as the other models here.

TPU notes: window partition/shift are reshape/transpose/roll (static shapes);
the shifted-window attention mask is precomputed per stage resolution and
added before softmax, so each block is one fixed-shape XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sam_quantization_tpu.nn import functional as F
from sam_quantization_tpu.quant.context import NULL_CTX


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-5

    def stage_dim(self, s: int) -> int:
        return self.embed_dim * (2**s)

    def stage_resolution(self, s: int) -> int:
        return self.img_size // self.patch_size // (2**s)


SWIN_T = SwinConfig()
SWIN_S = SwinConfig(depths=(2, 2, 18, 2))
SWIN_B = SwinConfig(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32))

SWIN_CONFIGS = {"swin_tiny": SWIN_T, "swin_small": SWIN_S, "swin_base": SWIN_B}


def init(key: jax.Array, cfg: SwinConfig) -> dict:
    ks = iter(jax.random.split(key, 256))
    params = {
        "patch_embed": F.init_conv2d(next(ks), cfg.patch_size, cfg.patch_size,
                                     cfg.in_chans, cfg.embed_dim),
        "patch_norm": F.init_layer_norm(cfg.embed_dim),
        "stages": [],
        "norm": F.init_layer_norm(cfg.stage_dim(len(cfg.depths) - 1)),
        "head": F.init_linear(next(ks), cfg.stage_dim(len(cfg.depths) - 1),
                              cfg.num_classes),
    }
    for s, depth in enumerate(cfg.depths):
        dim = cfg.stage_dim(s)
        nh = cfg.num_heads[s]
        ws = cfg.window_size
        blocks = []
        for _ in range(depth):
            blocks.append({
                "norm1": F.init_layer_norm(dim),
                "attn": {
                    "qkv": F.init_linear(next(ks), dim, 3 * dim),
                    "proj": F.init_linear(next(ks), dim, dim),
                    "rel_bias_table": jax.random.normal(
                        next(ks), ((2 * ws - 1) ** 2, nh)
                    ) * 0.02,
                },
                "norm2": F.init_layer_norm(dim),
                "mlp": {
                    "lin1": F.init_linear(next(ks), dim, int(dim * cfg.mlp_ratio)),
                    "lin2": F.init_linear(next(ks), int(dim * cfg.mlp_ratio), dim),
                },
            })
        stage = {"blocks": blocks}
        if s < len(cfg.depths) - 1:
            stage["downsample"] = {
                "norm": F.init_layer_norm(4 * dim),
                "reduction": F.init_linear(next(ks), 4 * dim, 2 * dim, bias=False),
            }
        params["stages"].append(stage)
    return params


def _rel_bias_index(ws: int) -> np.ndarray:
    """Relative-position index for a ws×ws window (swin reference math)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws*ws, ws*ws)


def _shift_attn_mask(res: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows (−100 at cross-region pairs)."""
    img_mask = np.zeros((1, res, res, 1))
    cnt = 0
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    for h in slices:
        for w in slices:
            img_mask[:, h, w, :] = cnt
            cnt += 1
    nw = res // ws
    m = img_mask.reshape(1, nw, ws, nw, ws, 1).transpose(0, 1, 3, 2, 4, 5)
    m = m.reshape(-1, ws * ws)
    attn_mask = m[:, None, :] - m[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


def _window_attention(p, x, nh, ws, shift, res, ctx, path):
    """x: (B, res, res, C). Shifted-window MHA with relative position bias."""
    B, H, W, C = x.shape
    hd = C // nh
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    nw = H // ws
    xw = x.reshape(B, nw, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(B * nw * nw, ws * ws, C)

    qkv = ctx.linear(f"{path}.qkv", p["qkv"], xw)
    qkv = ctx.act(f"{path}.qact1", qkv)
    L = ws * ws
    qkv = qkv.reshape(-1, L, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jnp.einsum(
        "bhqc,bhkc->bhqk", q * (hd**-0.5), k, preferred_element_type=jnp.float32
    )
    idx = _rel_bias_index(ws)
    bias = p["rel_bias_table"][idx.reshape(-1)].reshape(L, L, nh)
    attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
    if shift > 0:
        mask = jnp.asarray(_shift_attn_mask(res, ws, shift))  # (nW, L, L)
        attn = attn.reshape(B, nw * nw, nh, L, L) + mask[None, :, None]
        attn = attn.reshape(-1, nh, L, L)
    attn = ctx.act(f"{path}.qact_attn1", attn.astype(x.dtype))
    attn = ctx.softmax(f"{path}.softmax", attn, scale_path=f"{path}.qact_attn1")
    out = jnp.einsum("bhqk,bhkc->bhqc", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(-1, L, C)
    out = ctx.act(f"{path}.qact2", out)
    out = ctx.linear(f"{path}.proj", p["proj"], out)
    out = ctx.act(f"{path}.qact3", out)

    xw = out.reshape(B, nw, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    x = xw.reshape(B, H, W, C)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    return x


def apply(p: dict, x: jax.Array, cfg: SwinConfig, ctx=NULL_CTX) -> jax.Array:
    """(B, H, W, 3) → (B, num_classes)."""
    B = x.shape[0]
    x = ctx.conv2d("patch_embed", p["patch_embed"], x, stride=cfg.patch_size)
    x = F.layer_norm(p["patch_norm"], x, cfg.ln_eps)
    x = ctx.act("qact_embed", x, ln_input=True)

    for s, stage in enumerate(p["stages"]):
        res = cfg.stage_resolution(s)
        nh = cfg.num_heads[s]
        ws = min(cfg.window_size, res)
        for i, blk in enumerate(stage["blocks"]):
            path = f"stages.{s}.blocks.{i}"
            shift = 0 if (i % 2 == 0 or ws == res) else ws // 2
            shortcut = x
            h = ctx.layer_norm(f"{path}.norm1", blk["norm1"], x, cfg.ln_eps)
            h = ctx.act(f"{path}.qact0", h)
            h = _window_attention(blk["attn"], h, nh, ws, shift, res, ctx,
                                  f"{path}.attn")
            x = ctx.act(f"{path}.qact_res1", shortcut + h, ln_input=True)
            h = ctx.layer_norm(f"{path}.norm2", blk["norm2"], x, cfg.ln_eps,
                               in_path=f"{path}.qact_res1",
                               out_path=f"{path}.qact_mlp_in")
            h = ctx.act(f"{path}.qact_mlp_in", h)
            h = ctx.linear(f"{path}.mlp.lin1", blk["mlp"]["lin1"], h)
            h = F.gelu(h)
            h = ctx.act(f"{path}.mlp.qact1", h)
            h = ctx.linear(f"{path}.mlp.lin2", blk["mlp"]["lin2"], h)
            h = ctx.act(f"{path}.mlp.qact2", h)
            x = ctx.act(f"{path}.qact_res2", x + h, ln_input=True)
        if "downsample" in stage:
            # patch merging: 2x2 neighborhood concat → LN → linear /2
            Bc, H, W, C = x.shape
            x = x.reshape(Bc, H // 2, 2, W // 2, 2, C)
            x = x.transpose(0, 1, 3, 4, 2, 5).reshape(Bc, H // 2, W // 2, 4 * C)
            # swin concat order: (0::2,0::2),(1::2,0::2),(0::2,1::2),(1::2,1::2)
            x = jnp.concatenate(
                [x[..., 0 * C:1 * C], x[..., 2 * C:3 * C],
                 x[..., 1 * C:2 * C], x[..., 3 * C:4 * C]], axis=-1
            )
            ds = stage["downsample"]
            x = F.layer_norm(ds["norm"], x, cfg.ln_eps)
            x = ctx.linear(f"stages.{s}.downsample", ds["reduction"], x)

    x = ctx.layer_norm("norm", p["norm"], x, cfg.ln_eps)
    x = ctx.act("qact_out", x)
    x = x.reshape(B, -1, x.shape[-1]).mean(axis=1)  # global average pool
    return ctx.linear("head", p["head"], x)
