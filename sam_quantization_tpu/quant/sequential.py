"""Sequential (block-by-block) GPTQ calibration of the SAM image encoder.

Capability counterpart of the reference's ``sam_sequential`` + ``sam_pack``
(gptq4sam.py:279-497): capture block-0 inputs, then per block accumulate each
linear's Hessian over the calibration set, solve GPTQ, and propagate the
*quantized* block's outputs to the next block.

Differences from the reference (deliberate):
  * block-0 inputs come from running the embed stage directly — no
    ``Catcher`` module raising ValueError as control flow (gptq4sam.py:311-329);
  * Hessians are accumulated *inside* jit via a capture context that returns
    ``xᵀx`` per observed linear — activations never leave the device;
  * packing goes straight into :class:`PackedLinear` (block-planar layout)
    consumed by the fused Pallas kernel — replacing sam_pack's bit-shift
    loops (gptq4sam.py:434-497).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sam_quantization_tpu.models import image_encoder
from sam_quantization_tpu.models.configs import ImageEncoderConfig
from sam_quantization_tpu.nn import functional as F
from sam_quantization_tpu.nn.packed import PackedLinear, pack_int_weights
from sam_quantization_tpu.quant import gptq
from sam_quantization_tpu.quant.context import NullCtx
from sam_quantization_tpu.quant.overrides import QuantOverrides

TRUE_SEQUENTIAL_SUBSETS: Sequence[Sequence[str]] = (
    ("attn.qkv",),
    ("attn.proj",),
    ("mlp.lin1", "mlp.lin2"),
)  # gptq4sam.py:348-352


class HessianCaptureCtx(NullCtx):
    """Records Σ xᵀx for the inputs of selected linear layers."""

    def __init__(self, paths: Sequence[str]):
        self.paths = set(paths)
        self.xtx: Dict[str, jax.Array] = {}
        self.rows: Dict[str, jax.Array] = {}

    def linear(self, path: str, p, x):
        leaf = path.split(".", 2)[-1] if path.count(".") >= 2 else path
        if leaf in self.paths or path in self.paths:
            x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
            acc = x2.T @ x2
            key = leaf if leaf in self.paths else path
            self.xtx[key] = self.xtx.get(key, 0.0) + acc
            self.rows[key] = self.rows.get(key, 0.0) + jnp.float32(x2.shape[0])
        return F.linear(p, x)


def _get_linear(block_params: dict, path: str) -> dict:
    node = block_params
    for part in path.split("."):
        node = node[part]
    return node


def _set_linear(block_params: dict, path: str, value) -> dict:
    parts = path.split(".")
    node = block_params
    for part in parts[:-1]:
        node = node[part]
    node[parts[-1]] = value
    return block_params


def quantize_linear_gptq(
    lin: dict, h: jax.Array, qcfg: gptq.GPTQConfig
) -> tuple[PackedLinear | dict, float]:
    """Solve GPTQ for one linear param dict {'w': (K, N), 'b'?} and pack.

    Returns (packed or fake-quant params, solver loss). Packing requires the
    actorder-free grouped layout; with actorder the integer grid follows the
    permuted column order, so we store the dequantized fake-quant weights
    instead (numerics identical, bandwidth savings deferred).
    """
    w = lin["w"]
    K, N = w.shape
    # tiny layers: a group never exceeds the K axis (the RTN path clamps
    # the same way in nn/packed.quantize_rtn; without this, vit_tiny's
    # 64-wide layers at --groupsize 128 break the solve AND the pack)
    gsize = min(qcfg.groupsize, K) if qcfg.groupsize > 0 else qcfg.groupsize
    res = gptq.gptq_quantize_matrix(
        w.T.astype(jnp.float32),
        h,
        bits=qcfg.bits,
        groupsize=gsize,
        sym=qcfg.sym,
        actorder=qcfg.actorder,
        percdamp=qcfg.percdamp,
        blocksize=qcfg.blocksize,
        mse=qcfg.mse,
    )
    loss = float(res.loss)
    bias = lin.get("b")
    if qcfg.actorder or qcfg.bits not in (2, 3, 4, 8):
        # With actorder the integer grid's groups follow the permuted column
        # order (g_idx); the packed layout wants contiguous groups, so store
        # the (correctly gathered) dequantized weights instead.
        wq = gptq.reconstruct(res, gsize, K).T.astype(w.dtype)
        out: PackedLinear | dict = {"w": wq} if bias is None else {"w": wq, "b": bias}
    else:
        out = pack_int_weights(
            res.q_int.T, res.scales.T, res.zeros.T, bias, qcfg.bits, gsize,
            sym=qcfg.sym,
        )
    return out, loss


def _resolve_qcfg(
    qcfg: gptq.GPTQConfig, overrides: Optional[QuantOverrides], path: str
) -> Optional[gptq.GPTQConfig]:
    """Per-layer config after overrides; None = skip (leave FP).

    The PPQ-analog action path (script/custimized_quant.py:56-147): a
    diagnosis from quant.analysis can bump worst ops to higher bits or
    exclude them while the rest of the net quantizes at the global config.
    """
    if overrides is None:
        return qcfg
    ov = overrides.match(path)
    if ov is None:
        return qcfg
    if ov.skip:
        return None
    return dataclasses.replace(
        qcfg,
        bits=ov.bits if ov.bits is not None else qcfg.bits,
        groupsize=ov.groupsize if ov.groupsize is not None else qcfg.groupsize,
        sym=ov.sym if ov.sym is not None else qcfg.sym,
    )


def gptq_quantize_encoder(
    params: dict,
    ecfg: ImageEncoderConfig,
    batches: Iterable[jax.Array],
    qcfg: gptq.GPTQConfig,
    true_sequential: bool = True,
    verbose: bool = False,
    overrides: Optional[QuantOverrides] = None,
) -> tuple[dict, Dict[str, float]]:
    """Quantize every transformer-block linear of the encoder in place.

    ``batches``: preprocessed (B, img, img, 3) images. Returns (new params
    tree with PackedLinear leaves, {layer path: reconstruction loss}).
    ``overrides``: per-op mixed-precision / exclusion rules.
    """
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree

    embed_fn = jax.jit(lambda p, x: image_encoder.embed(p, x, ecfg))
    xs: List[jax.Array] = [embed_fn(params, b) for b in batches]
    nbatches = len(xs)

    losses: Dict[str, float] = {}
    subsets = (
        TRUE_SEQUENTIAL_SUBSETS
        if true_sequential
        else (tuple(p for s in TRUE_SEQUENTIAL_SUBSETS for p in s),)
    )

    # Jits are keyed by (window size, subset): blocks with the same window
    # share shapes, so ViT-H compiles 2 windows × (3 subsets + 1 fwd) programs
    # instead of 32 × 4 (the reference pays a fresh CUDA graph per layer too,
    # but compile cost dominates on TPU).
    capture_fns: Dict = {}
    fwd_fns: Dict = {}

    def capture_fn(ws: int, slot: int, subset):
        key = (ws, subset)
        if key not in capture_fns:
            def f(bp, x, slot=slot, subset=subset):
                ctx = HessianCaptureCtx(subset)
                image_encoder.block_apply(bp, x, ecfg, slot, ctx, attn_impl="xla")
                return ctx.xtx
            capture_fns[key] = jax.jit(f)
        return capture_fns[key]

    def fwd_fn(ws: int, slot: int):
        if ws not in fwd_fns:
            fwd_fns[ws] = jax.jit(
                lambda bp, x, slot=slot: image_encoder.block_apply(
                    bp, x, ecfg, slot, NullCtx(), attn_impl="xla"
                )
            )
        return fwd_fns[ws]

    for i in range(ecfg.depth):
        block = params["blocks"][i]
        ws = ecfg.block_window(i)
        for subset in subsets:
            # Hessian accumulation for this subset, with already-quantized
            # earlier subsets active (gptq4sam.py:341-398 semantics).
            capture = capture_fn(ws, i, subset)
            h_acc: Dict[str, jax.Array] = {}
            for x in xs:
                xtx = capture(block, x)
                for k, v in xtx.items():
                    h_acc[k] = h_acc.get(k, 0.0) + v
            for path in subset:
                full_path = f"blocks.{i}.{path}"
                layer_qcfg = _resolve_qcfg(qcfg, overrides, full_path)
                if layer_qcfg is None:
                    losses[full_path] = 0.0  # skipped: stays FP
                    continue
                # H = (2 / nsamples) Σ xᵀx  (gptq.py:55-60 with tmp=1/batch)
                h = (2.0 / nbatches) * h_acc[path]
                lin = _get_linear(block, path)
                qlin, loss = quantize_linear_gptq(lin, h, layer_qcfg)
                _set_linear(block, path, qlin)
                losses[full_path] = loss
                if verbose:
                    print(f"{full_path}: loss={loss:.4f}")
        # Propagate quantized outputs to the next block (gptq4sam.py:399-412).
        fwd = fwd_fn(ws, i)
        xs = [fwd(block, x) for x in xs]
    return params, losses


def rtn_quantize_encoder(
    params: dict, qcfg: gptq.GPTQConfig, overrides: Optional[QuantOverrides] = None
) -> dict:
    """Round-to-nearest baseline over all block linears (reference
    ``--nearest`` path, gptq4sam.py:355-367, and main3.py RTN)."""
    from sam_quantization_tpu.nn.packed import quantize_rtn

    params = jax.tree_util.tree_map(lambda x: x, params)
    for i, block in enumerate(params["blocks"]):
        for path in ("attn.qkv", "attn.proj", "mlp.lin1", "mlp.lin2"):
            layer_qcfg = _resolve_qcfg(qcfg, overrides, f"blocks.{i}.{path}")
            if layer_qcfg is None:
                continue
            lin = _get_linear(block, path)
            p = quantize_rtn(
                lin["w"], layer_qcfg.bits, max(layer_qcfg.groupsize, 0),
                layer_qcfg.sym, bias=lin.get("b"),
            )
            _set_linear(block, path, p)
    return params
