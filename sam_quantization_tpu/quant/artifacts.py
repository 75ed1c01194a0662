"""Quantized-checkpoint artifacts: save/load packed encoders.

Counterpart of the reference's GPTQ artifact format — a directory holding
``model.pt``/``model.safetensors`` + ``quant_config.json`` {wbits, groupsize}
(gptq4sam.py:651-663; loader gptq_triton/__init__.py:15-105). Ours is a
directory with ``quant_config.json`` + ``weights.npz`` of flattened pytree
leaves; PackedLinear nodes round-trip with their static metadata.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sam_quantization_tpu.nn.packed import PackedLinear


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray], meta: Dict[str, Any]):
    if isinstance(tree, PackedLinear):
        meta[prefix] = {
            "kind": "packed_linear",
            "bits": tree.bits,
            "in_features": tree.in_features,
            "out_features": tree.out_features,
            "groupsize": tree.groupsize,
            "pack_block": tree.pack_block,
            "has_bias": tree.bias is not None,
            "act_bits": tree.act_bits,
            "sym": tree.sym,
        }
        out[f"{prefix}.qweight"] = np.asarray(tree.qweight)
        if tree.qweight_hi is not None:
            out[f"{prefix}.qweight_hi"] = np.asarray(tree.qweight_hi)
        out[f"{prefix}.scales"] = np.asarray(tree.scales)
        out[f"{prefix}.zeros"] = np.asarray(tree.zeros)
        if tree.bias is not None:
            out[f"{prefix}.bias"] = np.asarray(tree.bias)
    elif isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}.{k}" if prefix else k, out, meta)
    elif isinstance(tree, (list, tuple)):
        meta[prefix + "#len"] = len(tree)
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}.{i}", out, meta)
    elif tree is None:
        meta[prefix] = {"kind": "none"}
    else:
        out[prefix] = np.asarray(tree)


def save_quantized(directory: str, params: Any, quant_config: Dict[str, Any]):
    """Write quant_config.json + weights.npz (+ structure.json)."""
    os.makedirs(directory, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    meta: Dict[str, Any] = {}
    _flatten(params, "", arrays, meta)
    np.savez(os.path.join(directory, "weights.npz"), **arrays)
    with open(os.path.join(directory, "quant_config.json"), "w") as f:
        json.dump(quant_config, f, indent=2)
    with open(os.path.join(directory, "structure.json"), "w") as f:
        json.dump(meta, f)


def _unflatten(arrays: Dict[str, np.ndarray], meta: Dict[str, Any]) -> Any:
    root: Dict[str, Any] = {}

    def ensure(node, parts):
        for p in parts:
            node = node.setdefault(p, {})
        return node

    packed_prefixes = {k for k, v in meta.items() if isinstance(v, dict) and v.get("kind") == "packed_linear"}

    for key, arr in arrays.items():
        parts = key.split(".")
        # packed tensors handled below
        if any(key.startswith(p + ".") and key[len(p) + 1:] in ("qweight", "qweight_hi", "scales", "zeros", "bias") for p in packed_prefixes):
            continue
        parent = ensure(root, parts[:-1])
        parent[parts[-1]] = jnp.asarray(arr)

    for prefix in packed_prefixes:
        m = meta[prefix]
        parts = prefix.split(".")
        parent = ensure(root, parts[:-1])
        parent[parts[-1]] = PackedLinear(
            qweight=jnp.asarray(arrays[f"{prefix}.qweight"]),
            qweight_hi=(
                jnp.asarray(arrays[f"{prefix}.qweight_hi"])
                if f"{prefix}.qweight_hi" in arrays else None
            ),
            scales=jnp.asarray(arrays[f"{prefix}.scales"]),
            zeros=jnp.asarray(arrays[f"{prefix}.zeros"]),
            bias=(
                jnp.asarray(arrays[f"{prefix}.bias"]) if m["has_bias"] else None
            ),
            bits=m["bits"],
            in_features=m["in_features"],
            out_features=m["out_features"],
            groupsize=m["groupsize"],
            pack_block=m["pack_block"],
            act_bits=m.get("act_bits", 0),
            sym=m.get("sym", False),
        )

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def load_quantized(directory: str) -> Tuple[Any, Dict[str, Any]]:
    """Load (params, quant_config) from a save_quantized directory
    (counterpart of gptq_triton load_quant, __init__.py:15-81)."""
    if not os.path.isfile(os.path.join(directory, "quant_config.json")):
        raise FileNotFoundError(
            f"{directory!r} is not a quantized-artifact directory "
            "(missing quant_config.json — create one with "
            "`python -m sam_quantization_tpu.cli.quantize ... --save DIR`)"
        )
    with open(os.path.join(directory, "quant_config.json")) as f:
        cfg = json.load(f)
    with open(os.path.join(directory, "structure.json")) as f:
        meta = json.load(f)
    arrays = dict(np.load(os.path.join(directory, "weights.npz")))
    return _unflatten(arrays, meta), cfg
