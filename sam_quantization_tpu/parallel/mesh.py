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

import contextlib
from typing import List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sam_quantization_tpu.nn.packed import IntLinear, PackedLinear

# ---------------------------------------------------------------------------
# Active tensor-parallel context. The Megatron pairing (qkv/lin1 out-sharded,
# proj/lin2 in-sharded) only yields its intended 2-psums-per-block schedule
# if the ATTENTION between qkv and proj keeps heads sharded. The model's
# attention code merges (B, nh) into one dim for its einsums, and GSPMD
# cannot represent "inner factor sharded" on a merged dimension — measured
# consequence (tools/mesh_collectives.py): the compiler all-gathers the full
# qkv activation (75 MB per ViT-H windowed block) and runs attention
# replicated. With this context active, models/image_encoder.attention takes
# an unmerged (B, nh, L, hd) path with explicit sharding constraints and the
# all-gathers disappear (re-audited in BENCHMARKS.md).
# ---------------------------------------------------------------------------

_TP_ACTIVE: List[Tuple[Mesh, str, bool]] = []


@contextlib.contextmanager
def tensor_parallel(mesh: Mesh, axis: str = "tp", packed_qkv: bool = True):
    """Within the body, the encoder's attention keeps heads sharded on
    ``axis`` (constraint-guided GSPMD) — use around tp-sharded forwards.

    ``packed_qkv=True`` declares that the qkv weights were re-laid-out by
    :func:`tp_pack_qkv` (tp-major head interleave). This is what actually
    removes the all-gather: with the stock ``[q|k|v]`` fused column layout,
    an N-sharding boundary falls INSIDE q, head-aligned sharding of the
    (B, L, 3, nh, hd) reshape is inexpressible, and GSPMD gathers the whole
    qkv activation (measured 75 MB per ViT-H windowed block,
    tools/mesh_collectives.py --no-tp-ctx).
    """
    _TP_ACTIVE.append((mesh, axis, packed_qkv))
    try:
        yield
    finally:
        _TP_ACTIVE.pop()


def active_tp(num_heads: int) -> Optional[Tuple[Mesh, str, bool]]:
    """(mesh, axis, packed_qkv) when a tensor-parallel context is active and
    the head count divides over it."""
    if not _TP_ACTIVE:
        return None
    mesh, axis, packed = _TP_ACTIVE[-1]
    if num_heads % mesh.shape[axis] != 0:
        return None
    return mesh, axis, packed


def _qkv_perm(nh: int, hd: int, tp: int) -> np.ndarray:
    """Column permutation [q|k|v] (head-major) -> tp-major interleave
    [q_d | k_d | v_d for shard d]: contiguous N-chunks become head-aligned,
    so P(None, tp) weight sharding IS Megatron head sharding."""
    return (
        np.arange(3 * nh * hd)
        .reshape(3, tp, nh // tp, hd)
        .transpose(1, 0, 2, 3)
        .reshape(-1)
    )


def tp_pack_qkv(encoder_params: dict, num_heads: int, tp: int) -> dict:
    """Re-lay every block's fused qkv columns for tensor parallelism.

    Works on dense dicts, :class:`IntLinear`, and :class:`PackedLinear`
    (block-planar packing runs along K, so an N permutation is exact).
    Pair with ``tensor_parallel(mesh, packed_qkv=True)`` — the attention
    branch consumes the permuted layout; output channel order is unchanged
    (heads stay in ascending order), so proj needs no change.
    """
    import dataclasses

    def permute(p, idx):
        if isinstance(p, IntLinear):
            return dataclasses.replace(
                p,
                w8=p.w8[idx, :] if p.layout == "nk" else p.w8[:, idx],
                scales=p.scales[:, idx],
                bias=None if p.bias is None else p.bias[idx],
                in_scale=p.in_scale,
            )
        if isinstance(p, PackedLinear):
            return dataclasses.replace(
                p,
                qweight=p.qweight[:, idx],
                qweight_hi=None if p.qweight_hi is None else p.qweight_hi[:, idx],
                scales=p.scales[:, idx],
                zeros=p.zeros[:, idx],
                bias=None if p.bias is None else p.bias[idx],
            )
        q = {"w": p["w"][:, idx]}
        if "b" in p:
            q["b"] = p["b"][idx]
        return q

    out = dict(encoder_params)
    blocks = []
    for blk in encoder_params["blocks"]:
        hd = (
            blk["attn"]["qkv"]["w"].shape[1]
            if isinstance(blk["attn"]["qkv"], dict)
            else blk["attn"]["qkv"].out_features
        ) // (3 * num_heads)
        idx = _qkv_perm(num_heads, hd, tp)
        nblk = dict(blk)
        nattn = dict(blk["attn"])
        nattn["qkv"] = permute(blk["attn"]["qkv"], idx)
        nblk["attn"] = nattn
        blocks.append(nblk)
    out["blocks"] = blocks
    return out


def tp_constrain(x: jax.Array, dim: int, mesh: Mesh, axis: str) -> jax.Array:
    """Constrain ``x`` to be sharded on ``axis`` along dimension ``dim``,
    leaving every other dimension UNCONSTRAINED (a plain ``None`` there
    would force replication — measured: it all-gathered the dp-sharded
    batch dim, 90 MB per ViT-B windowed block, the exact class of bug this
    helper exists to remove)."""
    spec = [P.UNCONSTRAINED] * x.ndim
    spec[dim] = axis
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


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
        w8_spec = (
            P(out_axis, in_axis) if p.layout == "nk" else P(in_axis, out_axis)
        )
        return IntLinear(
            w8=w8_spec,
            scales=P(None, out_axis),
            bias=None if p.bias is None else P(out_axis),
            in_scale=None if p.in_scale is None else P(),
            groupsize=p.groupsize,
            layout=p.layout,
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
