"""Device mesh construction and sharding rules for SAM.

The reference's only parallelism is single-node NCCL DDP
(train_sm.py:122-129, utils/distributed.py) — here parallelism is expressed
TPU-natively as a ``jax.sharding.Mesh`` over ("dp", "tp") with named
shardings; XLA GSPMD inserts the collectives (all-reduce of tensor-parallel
matmul partials and data-parallel gradients) over ICI.

Sharding rules:
  * batch ("dp"): images, activations, gradients — the DDP counterpart;
  * tensor ("tp"): encoder block weights — qkv/lin1 split on the output
    axis, proj/lin2 on the input axis (Megatron-style pairing so each block
    needs exactly one psum per attention and one per MLP);
  * packed INT4 weights shard the same way: ``qweight (K/per, N)`` splits on
    N for qkv/lin1 and on K/per for proj/lin2 (pack blocks are contiguous
    along K, so K-sharding stays unpack-aligned as long as
    K/tp % pack_block == 0).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sam_quantization_tpu.nn.packed import IntLinear, PackedLinear


def make_mesh(
    n_devices: Optional[int] = None, tp: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % tp == 0, (n, tp)
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _linear_spec(p, out_axis: Optional[str], in_axis: Optional[str]):
    """PartitionSpec tree for a linear param (dict, PackedLinear, IntLinear)."""
    if isinstance(p, IntLinear):
        return IntLinear(
            w8=P(in_axis, out_axis),
            scales=P(None, out_axis),
            bias=None if p.bias is None else P(out_axis),
            in_scale=None if p.in_scale is None else P(),
            groupsize=p.groupsize,
        )
    if isinstance(p, PackedLinear):
        return PackedLinear(
            qweight=P(in_axis, out_axis),
            qweight_hi=None if p.qweight_hi is None else P(in_axis, out_axis),
            scales=P(None, out_axis),
            zeros=P(None, out_axis),
            bias=None if p.bias is None else P(out_axis),
            bits=p.bits,
            in_features=p.in_features,
            out_features=p.out_features,
            groupsize=p.groupsize,
            pack_block=p.pack_block,
        )
    spec = {"w": P(in_axis, out_axis)}
    if "b" in p:
        spec["b"] = P(out_axis)
    return spec


def encoder_param_specs(params: dict, tp_axis: str = "tp"):
    """PartitionSpec pytree for encoder params (tensor-parallel blocks,
    replicated embeddings/neck)."""

    def replicate(tree):
        return jax.tree_util.tree_map(lambda _: P(), tree)

    specs = {k: replicate(v) for k, v in params.items() if k != "blocks"}
    blocks = []
    for blk in params["blocks"]:
        bspec = {
            "norm1": replicate(blk["norm1"]),
            "norm2": replicate(blk["norm2"]),
            "attn": {
                "qkv": _linear_spec(blk["attn"]["qkv"], tp_axis, None),
                "proj": _linear_spec(blk["attn"]["proj"], None, tp_axis),
            },
            "mlp": {
                "lin1": _linear_spec(blk["mlp"]["lin1"], tp_axis, None),
                "lin2": _linear_spec(blk["mlp"]["lin2"], None, tp_axis),
            },
        }
        for k in ("rel_pos_h", "rel_pos_w"):
            if k in blk["attn"]:
                bspec["attn"][k] = P()
        blocks.append(bspec)
    specs["blocks"] = blocks
    return specs


def sam_param_specs(model_params_tree):
    """Specs for a full Sam pytree: TP encoder + replicated prompt/decoder."""
    from sam_quantization_tpu.models.sam import Sam

    assert isinstance(model_params_tree, Sam)
    rep = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)
    return Sam(
        image_encoder=encoder_param_specs(model_params_tree.image_encoder),
        prompt_encoder=rep(model_params_tree.prompt_encoder),
        mask_decoder=rep(model_params_tree.mask_decoder),
        config=model_params_tree.config,
    )


def shard_params(params, mesh: Mesh, specs):
    """Place a parameter pytree onto the mesh per the spec tree."""
    return jax.tree_util.tree_map(
        lambda x, s: None
        if x is None
        else jax.device_put(x, NamedSharding(mesh, s if s is not None else P())),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P) or x is None,
    )


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
