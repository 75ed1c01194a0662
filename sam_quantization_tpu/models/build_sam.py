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


def to_torch_state_dict(model: sam_lib.Sam) -> Dict[str, "np.ndarray"]:
    """Inverse of :func:`convert_torch_state_dict`: export a :class:`Sam`
    pytree as a numpy-valued torch-layout state dict (linear weights back to
    (out, in), convs to OIHW, transposed convs to (I, O, kh, kw)).

    Exists so models trained/quantized here can run under the *reference's
    own* torch modules — the cross-harness validation of the click-loop
    evaluator (tools/cross_validate_harness.py) converts the committed
    vit_tiny checkpoint through this and scores it with the reference's
    5-click semantics (script/evaluation2.py:225-334).
    """
    cfg = model.config
    ecfg = cfg.image_encoder
    out: Dict[str, np.ndarray] = {}

    def put(k, a):
        out[k] = np.asarray(a, np.float32)

    def put_lin(prefix, p):
        w = p["w"] if isinstance(p, dict) else None
        if w is None:  # packed/int nodes: export the dequantized dense view
            from sam_quantization_tpu.nn.functional import to_fp32_weight

            w = to_fp32_weight(p)
            b = getattr(p, "bias", None)
        else:
            b = p.get("b")
        put(f"{prefix}.weight", np.asarray(w, np.float32).T)
        if b is not None:
            put(f"{prefix}.bias", b)

    def put_ln(prefix, p):
        put(f"{prefix}.weight", p["w"])
        put(f"{prefix}.bias", p["b"])

    def put_conv(prefix, p):
        put(f"{prefix}.weight", np.asarray(p["w"], np.float32).transpose(3, 2, 0, 1))
        if "b" in p:
            put(f"{prefix}.bias", p["b"])

    def put_convt(prefix, p):
        put(f"{prefix}.weight", np.asarray(p["w"], np.float32).transpose(2, 3, 0, 1))
        if "b" in p:
            put(f"{prefix}.bias", p["b"])

    enc = model.image_encoder
    put_conv("image_encoder.patch_embed.proj", enc["patch_embed"])
    if ecfg.use_abs_pos:
        put("image_encoder.pos_embed", enc["pos_embed"])
    put_conv("image_encoder.neck.0", enc["neck"]["conv1"])
    put_ln("image_encoder.neck.1", enc["neck"]["ln1"])
    put_conv("image_encoder.neck.2", enc["neck"]["conv2"])
    put_ln("image_encoder.neck.3", enc["neck"]["ln2"])
    for i, blk in enumerate(enc["blocks"]):
        b = f"image_encoder.blocks.{i}"
        put_ln(f"{b}.norm1", blk["norm1"])
        put_lin(f"{b}.attn.qkv", blk["attn"]["qkv"])
        put_lin(f"{b}.attn.proj", blk["attn"]["proj"])
        put_ln(f"{b}.norm2", blk["norm2"])
        put_lin(f"{b}.mlp.lin1", blk["mlp"]["lin1"])
        put_lin(f"{b}.mlp.lin2", blk["mlp"]["lin2"])
        if ecfg.use_rel_pos:
            put(f"{b}.attn.rel_pos_h", blk["attn"]["rel_pos_h"])
            put(f"{b}.attn.rel_pos_w", blk["attn"]["rel_pos_w"])

    pe = "prompt_encoder"
    pp = model.prompt_encoder
    put(f"{pe}.pe_layer.positional_encoding_gaussian_matrix", pp["pe_gaussian"])
    for i in range(4):
        put(f"{pe}.point_embeddings.{i}.weight", pp["point_embeddings"][i : i + 1])
    put(f"{pe}.not_a_point_embed.weight", pp["not_a_point_embed"])
    put(f"{pe}.no_mask_embed.weight", pp["no_mask_embed"])
    md_map = [("conv1", "0"), ("ln1", "1"), ("conv2", "3"), ("ln2", "4"), ("conv3", "6")]
    for ours, theirs in md_map:
        node = pp["mask_downscaling"][ours]
        if ours.startswith("conv"):
            put_conv(f"{pe}.mask_downscaling.{theirs}", node)
        else:
            put_ln(f"{pe}.mask_downscaling.{theirs}", node)

    md = "mask_decoder"
    dd = model.mask_decoder

    def put_attn(prefix, p):
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put_lin(f"{prefix}.{name}", p[name])

    for i, layer in enumerate(dd["transformer"]["layers"]):
        t = f"{md}.transformer.layers.{i}"
        put_attn(f"{t}.self_attn", layer["self_attn"])
        put_ln(f"{t}.norm1", layer["norm1"])
        put_attn(f"{t}.cross_attn_token_to_image", layer["cross_attn_t2i"])
        put_ln(f"{t}.norm2", layer["norm2"])
        put_lin(f"{t}.mlp.lin1", layer["mlp"]["lin1"])
        put_lin(f"{t}.mlp.lin2", layer["mlp"]["lin2"])
        put_ln(f"{t}.norm3", layer["norm3"])
        put_ln(f"{t}.norm4", layer["norm4"])
        put_attn(f"{t}.cross_attn_image_to_token", layer["cross_attn_i2t"])
    put_attn(f"{md}.transformer.final_attn_token_to_image", dd["transformer"]["final_attn"])
    put_ln(f"{md}.transformer.norm_final_attn", dd["transformer"]["norm_final"])
    put(f"{md}.iou_token.weight", dd["iou_token"])
    put(f"{md}.mask_tokens.weight", dd["mask_tokens"])
    put_convt(f"{md}.output_upscaling.0", dd["output_upscaling"]["convt1"])
    put_ln(f"{md}.output_upscaling.1", dd["output_upscaling"]["ln"])
    put_convt(f"{md}.output_upscaling.3", dd["output_upscaling"]["convt2"])
    for i, h in enumerate(dd["hypernetworks"]):
        for j, lin in enumerate(h["layers"]):
            put_lin(f"{md}.output_hypernetworks_mlps.{i}.layers.{j}", lin)
    for j, lin in enumerate(dd["iou_head"]["layers"]):
        put_lin(f"{md}.iou_prediction_head.layers.{j}", lin)
    return out


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
