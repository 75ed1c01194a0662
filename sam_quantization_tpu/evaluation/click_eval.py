"""Interactive click-loop evaluation — the quality north star.

Counterpart of ``script/evaluation2.py:225-334`` (5-click random-error-pixel
loop reporting mean IoU / Click@k) and ``inference/evaluation.py:16-56`` +
``inference/utils.py:79-96`` (NoC evaluation to 20 clicks with
distance-transform click placement).

The model interface is a pair of callables so any backend plugs in (the
reference swaps torch / ONNX-Runtime / TensorRT engines at the same seam,
evaluation2.py:254-271):

  encode(image_nhwc_float) -> embedding
  decode(embedding, coords, labels, mask_input, mask_valid) -> (low_res, iou)

Prompts use fixed padded slots so the decode stays one compiled XLA program
across the whole loop.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sam_quantization_tpu.evaluation import metrics
from sam_quantization_tpu.evaluation.clicker import Clicker, next_random_click
from sam_quantization_tpu.models import sam as sam_lib


@dataclasses.dataclass
class ClickEvalResult:
    mean_ious: List[float]  # mean IoU after click k (len = num_clicks)
    per_sample_ious: List[List[float]]
    seconds_per_image: float
    # per-sample click sequences [(y, x, label), ...] — recorded so another
    # harness (e.g. the reference's torch loop, tools/cross_validate_harness)
    # can replay the identical clicks
    clicks: Optional[List[List[Tuple[int, int, float]]]] = None
    # per-sample per-click low-res mask logits (NCHW numpy), recorded with
    # ``record_low_res=True`` — the teacher-forcing seam for the
    # cross-harness cascade/numeric decomposition
    low_res: Optional[List[List[np.ndarray]]] = None

    @property
    def click1(self) -> float:
        return self.mean_ious[0]

    @property
    def final(self) -> float:
        return self.mean_ious[-1]


def make_sam_backend(model: sam_lib.Sam, ctx=None, attn_impl: str = "auto"):
    """(encode, decode) closures over a Sam pytree, jit-compiled."""
    from sam_quantization_tpu.ops.flash_attention import scoped_jit as _jit
    from sam_quantization_tpu.quant.context import NULL_CTX

    ctx = ctx or NULL_CTX

    @_jit
    def encode(x):
        return sam_lib.encode_image(model, x, ctx, attn_impl=attn_impl)

    @_jit
    def decode(emb, coords, labels, mask_input, mask_valid):
        low_res, iou = sam_lib.decode_masks(
            model,
            emb,
            points=(coords, labels),
            mask_inputs=mask_input,
            mask_valid=mask_valid,
            multimask_output=False,
        )
        size = model.config.image_encoder.img_size
        B, N = low_res.shape[:2]
        masks = jax.image.resize(low_res, (B, N, size, size), method="bilinear")
        return masks, low_res, iou

    return encode, decode


def click_loop_eval(
    encode: Callable,
    decode: Callable,
    samples: Iterable[Tuple[np.ndarray, np.ndarray]],
    num_clicks: int = 5,
    max_points: int = 24,
    seed: int = 42,
    img_size: int = 1024,
    verbose: bool = False,
    clicks_override: Optional[List[List[Tuple[int, int, float]]]] = None,
    point_layout: str = "literal",
    record_low_res: bool = False,
) -> ClickEvalResult:
    """The 5-click random-click loop (ref evaluation2.py:225-334).

    ``samples`` yields (preprocessed image NHWC float (1, S, S, 3), gt mask
    (S, S) binary). The mask prompt is fed back from click 2 onward
    (evaluation2.py:301-306).

    ``clicks_override``: per-sample pinned click sequences [(y, x, label)...]
    replayed instead of the random-error-pixel rule — the cross-harness
    validation seam (identical clicks through two harnesses must agree).
    The clicks actually used are always recorded in ``result.clicks``.

    ``point_layout``: "literal" (default) feeds the decoder exactly the k
    clicks made so far, matching the reference's growing click list
    (evaluation2.py:278-306 — the prompt encoder appends its own single pad
    point); one decode program compiles per click count. "slots" feeds the
    fixed ``max_points`` padded tensor — ONE compiled program for the whole
    loop (the serving-path form; pad slots are extra attention tokens, which
    shifts mIoU by ~0.04 on vit_tiny — CROSSVAL.json point_layout_delta).
    """
    rng = np.random.default_rng(seed)
    all_ious: List[List[float]] = []
    all_clicks: List[List[Tuple[int, int, float]]] = []
    all_low_res: List[List[np.ndarray]] = []
    t0 = time.perf_counter()
    n = 0
    for image, gt in samples:
        n += 1
        emb = encode(jnp.asarray(image))
        coords = np.zeros((1, max_points, 2), np.float32)
        labels = -np.ones((1, max_points), np.float32)
        h8 = img_size // 4
        mask_input = jnp.zeros((1, h8, h8, 1), jnp.float32)
        mask_valid = jnp.zeros((1,), bool)
        prev_mask = np.zeros_like(gt, dtype=bool)
        ious: List[float] = []
        sample_clicks: List[Tuple[int, int, float]] = []
        sample_low_res: List[np.ndarray] = []
        for click in range(num_clicks):
            if clicks_override is not None:
                cy, cx, lab = clicks_override[n - 1][click]
            else:
                (cy, cx), lab = next_random_click(prev_mask, gt, rng)
            sample_clicks.append((int(cy), int(cx), float(lab)))
            coords[0, click] = (cx, cy)  # model frame is (x, y)
            labels[0, click] = lab
            if point_layout == "literal":
                ck, lk = coords[:, : click + 1], labels[:, : click + 1]
            else:
                ck, lk = coords, labels
            masks, low_res, _iou = decode(
                emb, jnp.asarray(ck), jnp.asarray(lk), mask_input, mask_valid
            )
            mask_input = jnp.transpose(low_res, (0, 2, 3, 1))
            mask_valid = jnp.ones((1,), bool)
            if record_low_res:
                sample_low_res.append(np.asarray(low_res, np.float32))
            pred = np.asarray(masks[0, 0]) > 0
            prev_mask = pred[: gt.shape[0], : gt.shape[1]]
            ious.append(metrics.get_iou(gt, prev_mask))
        all_ious.append(ious)
        all_clicks.append(sample_clicks)
        if record_low_res:
            all_low_res.append(sample_low_res)
        if verbose:
            print(f"sample {n}: " + " ".join(f"{i:.3f}" for i in ious))
    elapsed = time.perf_counter() - t0
    arr = np.asarray(all_ious)
    return ClickEvalResult(
        mean_ious=list(arr.mean(axis=0)),
        per_sample_ious=all_ious,
        seconds_per_image=elapsed / max(n, 1),
        clicks=all_clicks,
        low_res=all_low_res if record_low_res else None,
    )


def noc_eval_predictor(
    eval_predictor,
    samples: Iterable[Tuple[np.ndarray, np.ndarray]],
    max_clicks: int = 20,
    iou_thrs=(0.80, 0.85, 0.90),
    pred_thr: float = 0.5,
):
    """NoC evaluation through a TTA/BRS predictor
    (``evaluation.predictors.SamEvalPredictor`` family) — the reference's
    evaluate_sample loop with predictor indirection
    (inference/evaluation.py:35-56)."""
    from sam_quantization_tpu.evaluation import metrics as _metrics

    all_ious = []
    t0 = time.perf_counter()
    n = 0
    for image, gt in samples:
        n += 1
        img = np.asarray(image)
        if img.ndim == 4:
            img = img[0]
        eval_predictor.set_input_image(img.astype(np.uint8))
        clicker = Clicker(gt_mask=gt)
        pred = np.zeros_like(gt, dtype=bool)
        ious = []
        for _ in range(max_clicks):
            clicker.make_next_click(pred)
            prob = eval_predictor.get_prediction(clicker)
            pred = prob[: gt.shape[0], : gt.shape[1]] > pred_thr
            iou = _metrics.get_iou(gt, pred)
            ious.append(iou)
            if iou >= max(iou_thrs):
                break
        all_ious.append(np.asarray(ious))
    elapsed = time.perf_counter() - t0
    noc, over = _metrics.compute_noc_metric(all_ious, iou_thrs, max_clicks)
    return noc, over, elapsed / max(n, 1)


def noc_eval(
    encode: Callable,
    decode: Callable,
    samples: Iterable[Tuple[np.ndarray, np.ndarray]],
    max_clicks: int = 20,
    iou_thrs=(0.80, 0.85, 0.90),
    max_points: int = 24,
    img_size: int = 1024,
    pred_thr: float = 0.0,
    point_layout: str = "literal",
):
    """NoC@τ evaluation with distance-transform clicks
    (ref inference/evaluation.py:16-56 evaluate_sample + utils.py:79-96).

    ``point_layout``: see :func:`click_loop_eval` — "literal" (default)
    matches the reference's growing click list; "slots" keeps one compiled
    decode program."""
    all_ious = []
    t0 = time.perf_counter()
    n = 0
    for image, gt in samples:
        n += 1
        emb = encode(jnp.asarray(image))
        clicker = Clicker(gt_mask=gt)
        coords = np.zeros((1, max_points, 2), np.float32)
        labels = -np.ones((1, max_points), np.float32)
        h8 = img_size // 4
        mask_input = jnp.zeros((1, h8, h8, 1), jnp.float32)
        mask_valid = jnp.zeros((1,), bool)
        pred = np.zeros_like(gt, dtype=bool)
        ious = []
        for k in range(max_clicks):
            clicker.make_next_click(pred)
            nk = 0
            for i, c in enumerate(clicker.get_clicks()[:max_points]):
                coords[0, i] = (c.coords[1], c.coords[0])
                labels[0, i] = 1.0 if c.is_positive else 0.0
                nk = i + 1
            if point_layout == "literal":
                ck, lk = coords[:, :nk], labels[:, :nk]
            else:
                ck, lk = coords, labels
            masks, low_res, _ = decode(
                emb, jnp.asarray(ck), jnp.asarray(lk), mask_input, mask_valid
            )
            mask_input = jnp.transpose(low_res, (0, 2, 3, 1))
            mask_valid = jnp.ones((1,), bool)
            pred = np.asarray(masks[0, 0])[: gt.shape[0], : gt.shape[1]] > pred_thr
            iou = metrics.get_iou(gt, pred)
            ious.append(iou)
            if iou >= max(iou_thrs):
                break
        all_ious.append(np.asarray(ious))
    elapsed = time.perf_counter() - t0
    noc, over = metrics.compute_noc_metric(all_ious, iou_thrs, max_clicks)
    return noc, over, elapsed / max(n, 1)
