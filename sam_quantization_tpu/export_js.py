"""Decoder weight export for the in-browser (pure-JS) mask decoder.

Counterpart of the reference demo's client-side decode: the reference ships
the SAM decoder as an ONNX graph executed by onnxruntime-web in the browser
(/root/reference/demo/README.md:1-28, demo/src/App.tsx). This stack's
browser decoder is dependency-free JavaScript (demo/decoder.js); this module
flattens the prompt-encoder + mask-decoder parameters into one little-endian
float32 blob plus a JSON manifest of tensor offsets the JS slices with
``Float32Array`` views — no runtime, no model format, just typed arrays.

Layouts match ``nn/functional.py``: linear ``w`` is (in, out), conv kernels
are HWIO, activations NHWC — the natural row-major JS loop order.
"""

from __future__ import annotations

import json
from typing import Dict, List, Tuple

import numpy as np


def _walk(node, path, out: List[Tuple[str, np.ndarray]]):
    if isinstance(node, dict):
        for k in sorted(node):
            _walk(node[k], f"{path}/{k}" if path else str(k), out)
    elif isinstance(node, (list, tuple)):
        for i, v in enumerate(node):
            _walk(v, f"{path}/{i}", out)
    else:
        out.append((path, np.asarray(node, np.float32)))


def flatten_decoder(model) -> Tuple[Dict, bytes]:
    """(manifest, blob) for the browser decoder.

    The manifest carries the decode-relevant config (dims, heads, eps) and a
    tensor table of {name, shape, offset} into the float32 blob. Only the
    prompt-encoder's sparse-prompt tensors are shipped — the browser path
    embeds points/boxes, not mask prompts (exactly the reference ONNX
    decoder's scope, segment_anything/utils/onnx.py).
    """
    pe = model.prompt_encoder
    md = model.mask_decoder
    tensors: List[Tuple[str, np.ndarray]] = []
    for name in ("pe_gaussian", "point_embeddings", "not_a_point_embed",
                 "no_mask_embed"):
        _walk(pe[name], f"prompt_encoder/{name}", tensors)
    _walk(md, "mask_decoder", tensors)

    cfg = model.config
    dcfg = cfg.mask_decoder
    tcfg = dcfg.transformer
    table = []
    parts = []
    off = 0
    for name, arr in tensors:
        parts.append(arr.tobytes())
        table.append({"name": name, "shape": list(arr.shape), "offset": off})
        off += arr.size
    manifest = {
        "dtype": "float32",
        "total_floats": off,
        "config": {
            "img_size": cfg.image_encoder.img_size,
            "embed_dim": dcfg.transformer_dim,
            "embedding_size": list(cfg.prompt_encoder.image_embedding_size),
            "depth": tcfg.depth,
            "num_heads": tcfg.num_heads,
            "mlp_dim": tcfg.mlp_dim,
            "downsample_rate": tcfg.attention_downsample_rate,
            "num_mask_tokens": dcfg.num_mask_tokens,
            "ln_eps": tcfg.ln_eps,
            "ln_eps_decoder": dcfg.ln_eps,
            "mask_threshold": 0.0,
            # pad the click list to this many slots (label -1) before the
            # final pad point, matching SamPredictor's fixed-shape decode
            # (predictor.py MAX_POINTS) so browser == server bit-for-bit
            "max_points": 24,
        },
        "tensors": table,
    }
    return manifest, b"".join(parts)


def export_decoder_js(model, out_dir: str) -> None:
    """Write ``decoder_manifest.json`` + ``decoder_weights.bin``."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    manifest, blob = flatten_decoder(model)
    with open(os.path.join(out_dir, "decoder_manifest.json"), "w") as f:
        json.dump(manifest, f)
    with open(os.path.join(out_dir, "decoder_weights.bin"), "wb") as f:
        f.write(blob)
