"""Model registry + torch checkpoint ingestion.

Counterpart of ``segment_anything/build_sam.py:14-107``: the
``sam_model_registry`` maps variant names to builders that optionally load the
official SAM ``.pth`` state dicts (converted tensor-by-tensor into our
layout — linear weights transposed to (in, out), convs to HWIO, transposed
convs to (kh, kw, I, O)).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sam_quantization_tpu.models import sam as sam_lib
from sam_quantization_tpu.models.configs import CONFIGS, SamConfig


def _t(a):  # torch (out, in) linear → (in, out)
    return jnp.asarray(np.asarray(a)).T


def _conv(a):  # torch (O, I, kh, kw) → (kh, kw, I, O)
    return jnp.asarray(np.asarray(a)).transpose(2, 3, 1, 0)


def _convt(a):  # torch ConvTranspose2d (I, O, kh, kw) → (kh, kw, I, O)
    return jnp.asarray(np.asarray(a)).transpose(2, 3, 0, 1)


def _arr(a):
    return jnp.asarray(np.asarray(a))


def _lin(sd, prefix) -> dict:
    p = {"w": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["b"] = _arr(sd[f"{prefix}.bias"])
    return p


def _ln(sd, prefix) -> dict:
    return {"w": _arr(sd[f"{prefix}.weight"]), "b": _arr(sd[f"{prefix}.bias"])}


def _conv_p(sd, prefix, bias=True) -> dict:
    p = {"w": _conv(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = _arr(sd[f"{prefix}.bias"])
    return p


def convert_torch_state_dict(sd: Dict[str, "np.ndarray"], cfg: SamConfig) -> sam_lib.Sam:
    """Convert a (numpy-valued) SAM torch state dict into a :class:`Sam` pytree.

    Key layout follows the reference modules exactly (see
    segment_anything/modeling/*.py); every tensor is re-laid-out for TPU as
    described in the module docstring.
    """
    ecfg = cfg.image_encoder

    enc = {
        "patch_embed": _conv_p(sd, "image_encoder.patch_embed.proj"),
        "neck": {
            "conv1": _conv_p(sd, "image_encoder.neck.0", bias=False),
            "ln1": _ln(sd, "image_encoder.neck.1"),
            "conv2": _conv_p(sd, "image_encoder.neck.2", bias=False),
            "ln2": _ln(sd, "image_encoder.neck.3"),
        },
        "blocks": [],
    }
    if ecfg.use_abs_pos:
        enc["pos_embed"] = _arr(sd["image_encoder.pos_embed"])
    for i in range(ecfg.depth):
        b = f"image_encoder.blocks.{i}"
        blk = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": {
                "qkv": _lin(sd, f"{b}.attn.qkv"),
                "proj": _lin(sd, f"{b}.attn.proj"),
            },
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp": {
                "lin1": _lin(sd, f"{b}.mlp.lin1"),
                "lin2": _lin(sd, f"{b}.mlp.lin2"),
            },
        }
        if ecfg.use_rel_pos:
            blk["attn"]["rel_pos_h"] = _arr(sd[f"{b}.attn.rel_pos_h"])
            blk["attn"]["rel_pos_w"] = _arr(sd[f"{b}.attn.rel_pos_w"])
        enc["blocks"].append(blk)

    pe = "prompt_encoder"
    prompt = {
        "pe_gaussian": _arr(sd[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"]),
        "point_embeddings": jnp.concatenate(
            [_arr(sd[f"{pe}.point_embeddings.{i}.weight"]) for i in range(4)], axis=0
        ),
        "not_a_point_embed": _arr(sd[f"{pe}.not_a_point_embed.weight"]),
        "no_mask_embed": _arr(sd[f"{pe}.no_mask_embed.weight"]),
        "mask_downscaling": {
            "conv1": _conv_p(sd, f"{pe}.mask_downscaling.0"),
            "ln1": _ln(sd, f"{pe}.mask_downscaling.1"),
            "conv2": _conv_p(sd, f"{pe}.mask_downscaling.3"),
            "ln2": _ln(sd, f"{pe}.mask_downscaling.4"),
            "conv3": _conv_p(sd, f"{pe}.mask_downscaling.6"),
        },
    }

    md = "mask_decoder"
    tcfg = cfg.mask_decoder.transformer

    def attn_p(prefix):
        return {
            "q_proj": _lin(sd, f"{prefix}.q_proj"),
            "k_proj": _lin(sd, f"{prefix}.k_proj"),
            "v_proj": _lin(sd, f"{prefix}.v_proj"),
            "out_proj": _lin(sd, f"{prefix}.out_proj"),
        }

    layers = []
    for i in range(tcfg.depth):
        t = f"{md}.transformer.layers.{i}"
        layers.append(
            {
                "self_attn": attn_p(f"{t}.self_attn"),
                "norm1": _ln(sd, f"{t}.norm1"),
                "cross_attn_t2i": attn_p(f"{t}.cross_attn_token_to_image"),
                "norm2": _ln(sd, f"{t}.norm2"),
                "mlp": {
                    "lin1": _lin(sd, f"{t}.mlp.lin1"),
                    "lin2": _lin(sd, f"{t}.mlp.lin2"),
                },
                "norm3": _ln(sd, f"{t}.norm3"),
                "norm4": _ln(sd, f"{t}.norm4"),
                "cross_attn_i2t": attn_p(f"{t}.cross_attn_image_to_token"),
            }
        )

    def hyper_mlp(prefix, num_layers=3):
        return {"layers": [_lin(sd, f"{prefix}.layers.{j}") for j in range(num_layers)]}

    decoder = {
        "transformer": {
            "layers": layers,
            "final_attn": attn_p(f"{md}.transformer.final_attn_token_to_image"),
            "norm_final": _ln(sd, f"{md}.transformer.norm_final_attn"),
        },
        "iou_token": _arr(sd[f"{md}.iou_token.weight"]),
        "mask_tokens": _arr(sd[f"{md}.mask_tokens.weight"]),
        "output_upscaling": {
            "convt1": {
                "w": _convt(sd[f"{md}.output_upscaling.0.weight"]),
                "b": _arr(sd[f"{md}.output_upscaling.0.bias"]),
            },
            "ln": _ln(sd, f"{md}.output_upscaling.1"),
            "convt2": {
                "w": _convt(sd[f"{md}.output_upscaling.3.weight"]),
                "b": _arr(sd[f"{md}.output_upscaling.3.bias"]),
            },
        },
        "hypernetworks": [
            hyper_mlp(f"{md}.output_hypernetworks_mlps.{i}")
            for i in range(cfg.mask_decoder.num_mask_tokens)
        ],
        "iou_head": hyper_mlp(
            f"{md}.iou_prediction_head", cfg.mask_decoder.iou_head_depth
        ),
    }

    return sam_lib.Sam(
        image_encoder=enc,
        prompt_encoder=prompt,
        mask_decoder=decoder,
        config=cfg,
    )


def load_torch_checkpoint(path: str, cfg: SamConfig) -> sam_lib.Sam:
    """Load an official SAM ``.pth`` checkpoint (requires torch, CPU-only)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_torch_state_dict(sd, cfg)


def _build(name: str, checkpoint: Optional[str] = None, seed: int = 0) -> sam_lib.Sam:
    cfg = CONFIGS[name]
    if checkpoint is not None:
        return load_torch_checkpoint(checkpoint, cfg)
    return sam_lib.init(jax.random.PRNGKey(seed), cfg)


def build_sam_vit_h(checkpoint=None, **kw):
    return _build("vit_h", checkpoint, **kw)


def build_sam_vit_l(checkpoint=None, **kw):
    return _build("vit_l", checkpoint, **kw)


def build_sam_vit_b(checkpoint=None, **kw):
    return _build("vit_b", checkpoint, **kw)


def build_sam_vit_tiny(checkpoint=None, **kw):
    return _build("vit_tiny", checkpoint, **kw)


sam_model_registry = {
    "default": build_sam_vit_h,
    "vit_h": build_sam_vit_h,
    "vit_l": build_sam_vit_l,
    "vit_b": build_sam_vit_b,
    "vit_tiny": build_sam_vit_tiny,
}
