"""AMG support utilities: MaskData, RLE, stability score, grids, crops, NMS.

Capability counterpart of ``segment_anything/utils/amg.py`` (and the NMS the
reference pulls from torchvision). Host-side numpy throughout — AMG
postprocessing is dynamic-shape filtering that belongs off the accelerator
(SURVEY §7 "keep filtering/NMS on host"); the compute-heavy parts (mask
prediction) stay in jitted XLA.
"""

from __future__ import annotations

import math
from copy import deepcopy
from itertools import product
from typing import Any, Dict, Generator, List, Tuple

import numpy as np


class MaskData:
    """Dict of batched mask-related numpy arrays/lists with joint
    filter/cat (ref amg.py:16-75)."""

    def __init__(self, **kwargs):
        for v in kwargs.values():
            assert isinstance(v, (list, np.ndarray)), type(v)
        self._stats: Dict[str, Any] = dict(**kwargs)

    def __setitem__(self, key, item):
        assert isinstance(item, (list, np.ndarray))
        self._stats[key] = item

    def __delitem__(self, key):
        del self._stats[key]

    def __getitem__(self, key):
        return self._stats[key]

    def items(self):
        return self._stats.items()

    def filter(self, keep: np.ndarray):
        for k, v in self._stats.items():
            if v is None:
                continue
            if isinstance(v, np.ndarray):
                self._stats[k] = v[keep]
            elif isinstance(v, list) and keep.dtype == bool:
                self._stats[k] = [a for i, a in enumerate(v) if keep[i]]
            elif isinstance(v, list):
                self._stats[k] = [v[i] for i in keep]
            else:
                raise TypeError(f"MaskData key {k} has unsupported type {type(v)}")

    def cat(self, new_stats: "MaskData"):
        for k, v in new_stats.items():
            if k not in self._stats or self._stats[k] is None:
                self._stats[k] = deepcopy(v)
            elif isinstance(v, np.ndarray):
                self._stats[k] = np.concatenate([self._stats[k], v], axis=0)
            elif isinstance(v, list):
                self._stats[k] = self._stats[k] + deepcopy(v)
            else:
                raise TypeError(f"MaskData key {k} has unsupported type {type(v)}")


def is_box_near_crop_edge(
    boxes: np.ndarray, crop_box: List[int], orig_box: List[int], atol: float = 20.0
) -> np.ndarray:
    """ref amg.py:78-94."""
    crop = np.asarray(crop_box, np.float32)
    orig = np.asarray(orig_box, np.float32)
    boxes = uncrop_boxes_xyxy(boxes, crop_box).astype(np.float32)
    near_crop = np.isclose(boxes, crop[None], atol=atol, rtol=0)
    near_orig = np.isclose(boxes, orig[None], atol=atol, rtol=0)
    near_crop = near_crop & ~near_orig
    return near_crop.any(axis=1)


def box_xyxy_to_xywh(box: np.ndarray) -> np.ndarray:
    out = np.array(box, dtype=box.dtype if hasattr(box, "dtype") else None).copy()
    out[2] = out[2] - out[0]
    out[3] = out[3] - out[1]
    return out


def batch_iterator(batch_size: int, *args) -> Generator[List[Any], None, None]:
    """ref amg.py:107-113."""
    assert len(args) > 0 and all(len(a) == len(args[0]) for a in args)
    n_batches = len(args[0]) // batch_size + int(len(args[0]) % batch_size != 0)
    for b in range(n_batches):
        yield [arg[b * batch_size : (b + 1) * batch_size] for arg in args]


# ---------------------------------------------------------------------------
# RLE (COCO uncompressed format; ref amg.py:116-144)
# ---------------------------------------------------------------------------


def mask_to_rle(mask: np.ndarray) -> Dict[str, Any]:
    """Single (H, W) binary mask → uncompressed RLE (column-major runs,
    starting with the count of 0s)."""
    h, w = mask.shape
    flat = np.asarray(mask, bool).T.reshape(-1)  # fortran order
    # run-length encode
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    idx = np.concatenate([[0], change, [len(flat)]])
    counts = np.diff(idx).tolist()
    if flat[0]:
        counts = [0] + counts
    return {"size": [h, w], "counts": counts}


def batched_mask_to_rle(masks: np.ndarray) -> List[Dict[str, Any]]:
    return [mask_to_rle(m) for m in masks]


def rle_to_mask(rle: Dict[str, Any]) -> np.ndarray:
    """ref amg.py:147-158."""
    h, w = rle["size"]
    mask = np.empty(h * w, dtype=bool)
    idx = 0
    parity = False
    for count in rle["counts"]:
        mask[idx : idx + count] = parity
        idx += count
        parity = not parity
    return mask.reshape(w, h).T


def area_from_rle(rle: Dict[str, Any]) -> int:
    return sum(rle["counts"][1::2])


def packbits_masks(binm):
    """Device-side column-major bit-pack: (N, H, W) bool → (N, W, ceil(H/8))
    uint8, bit j of byte b = row b*8+j (little bit order).

    The packed tensor IS the COCO column-major bit stream, so the host
    transfer shrinks 8× and ``native.rle_encode_batch_packed`` scans runs
    straight off the bytes — the round-4 AMG bench's 192 MB bool transfer
    (7.7 s over the axon tunnel) becomes 24 MB with no host unpack.
    """
    import jax.numpy as jnp

    t = jnp.transpose(binm, (0, 2, 1))  # (N, W, H): column-major bit order
    return jnp.packbits(t.astype(jnp.uint8), axis=-1, bitorder="little")


# ---------------------------------------------------------------------------
# Stability score, grids, crops (ref amg.py:161-234)
# ---------------------------------------------------------------------------


def calculate_stability_score(
    masks: np.ndarray, mask_threshold: float, threshold_offset: float
) -> np.ndarray:
    """IoU between high/low thresholded versions of the logits
    (ref amg.py:161-174)."""
    hi = (masks > (mask_threshold + threshold_offset)).sum(axis=(-2, -1), dtype=np.int64)
    lo = (masks > (mask_threshold - threshold_offset)).sum(axis=(-2, -1), dtype=np.int64)
    return hi / np.maximum(lo, 1)


def build_point_grid(n_per_side: int) -> np.ndarray:
    """ref amg.py:177-184."""
    offset = 1 / (2 * n_per_side)
    points_one_side = np.linspace(offset, 1 - offset, n_per_side)
    points_x = np.tile(points_one_side[None, :], (n_per_side, 1))
    points_y = np.tile(points_one_side[:, None], (1, n_per_side))
    return np.stack([points_x, points_y], axis=-1).reshape(-1, 2)


def build_all_layer_point_grids(
    n_per_side: int, n_layers: int, scale_per_layer: int
) -> List[np.ndarray]:
    return [
        build_point_grid(int(n_per_side / (scale_per_layer**i)))
        for i in range(n_layers + 1)
    ]


def generate_crop_boxes(
    im_size: Tuple[int, ...], n_layers: int, overlap_ratio: float
) -> Tuple[List[List[int]], List[int]]:
    """ref amg.py:201-234."""
    crop_boxes, layer_idxs = [], []
    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes.append([0, 0, im_w, im_h])
    layer_idxs.append(0)

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_crops_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_crops_per_side))
        crop_w = crop_len(im_w, n_crops_per_side, overlap)
        crop_h = crop_len(im_h, n_crops_per_side, overlap)
        crop_box_x0 = [int((crop_w - overlap) * i) for i in range(n_crops_per_side)]
        crop_box_y0 = [int((crop_h - overlap) * i) for i in range(n_crops_per_side)]
        for x0, y0 in product(crop_box_x0, crop_box_y0):
            box = [x0, y0, min(x0 + crop_w, im_w), min(y0 + crop_h, im_h)]
            crop_boxes.append(box)
            layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def uncrop_boxes_xyxy(boxes: np.ndarray, crop_box: List[int]) -> np.ndarray:
    x0, y0, _, _ = crop_box
    return boxes + np.array([[x0, y0, x0, y0]], dtype=boxes.dtype)


def uncrop_points(points: np.ndarray, crop_box: List[int]) -> np.ndarray:
    x0, y0, _, _ = crop_box
    return points + np.array([[x0, y0]], dtype=points.dtype)


def uncrop_masks(
    masks: np.ndarray, crop_box: List[int], orig_h: int, orig_w: int
) -> np.ndarray:
    x0, y0, x1, y1 = crop_box
    if x0 == 0 and y0 == 0 and x1 == orig_w and y1 == orig_h:
        return masks
    pad = ((0, 0), (y0, orig_h - y1), (x0, orig_w - x1))
    return np.pad(masks, pad)


def remove_small_regions(
    mask: np.ndarray, area_thresh: float, mode: str
) -> Tuple[np.ndarray, bool]:
    """Remove small disconnected regions/holes (ref amg.py:267-287; the
    reference uses cv2.connectedComponents — scipy labeling here)."""
    from scipy import ndimage

    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working_mask = (correct_holes ^ mask).astype(np.uint8)
    labels, n_labels = ndimage.label(working_mask)
    if n_labels == 0:
        return mask, False
    sizes = ndimage.sum_labels(np.ones_like(labels), labels, index=np.arange(1, n_labels + 1))
    small_regions = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small_regions:
        return mask, False
    fill_labels = [0] + small_regions
    if not correct_holes:
        fill_labels = [i for i in range(n_labels + 1) if i not in fill_labels]
        if not fill_labels:
            fill_labels = [int(np.argmax(sizes)) + 1]
    mask = np.isin(labels, fill_labels)
    return mask, True


def batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """XYXY boxes around masks; zeros for empty masks (ref amg.py:303-346)."""
    if masks.size == 0:
        return np.zeros((*masks.shape[:-2], 4), dtype=np.float32)
    shape = masks.shape
    masks = masks.reshape(-1, *shape[-2:]).astype(bool)
    h, w = masks.shape[-2:]
    in_height = masks.max(axis=-1)
    in_width = masks.max(axis=-2)
    ys = np.arange(h)[None, :]
    xs = np.arange(w)[None, :]
    bottom = (in_height * ys).max(axis=-1)
    top = np.where(in_height, ys, h).min(axis=-1)
    right = (in_width * xs).max(axis=-1)
    left = np.where(in_width, xs, w).min(axis=-1)
    empty = (top > bottom) | (left > right)
    out = np.stack([left, top, right, bottom], axis=-1).astype(np.float32)
    out[empty] = 0
    return out.reshape(*shape[:-2], 4)


def box_nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Greedy IoU NMS → kept indices, score-descending (stand-in for the
    torchvision batched_nms the reference uses, automatic_mask_generator.py:9)."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-9)
        order = rest[iou <= iou_threshold]
    return np.asarray(keep, np.int64)


def batched_nms(
    boxes: np.ndarray, scores: np.ndarray, idxs: np.ndarray, iou_threshold: float
) -> np.ndarray:
    """Category-aware NMS via the coordinate-offset trick."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    max_coord = boxes.max() + 1
    offsets = idxs.astype(np.float32) * max_coord
    shifted = boxes + offsets[:, None]
    return box_nms(shifted, scores, iou_threshold)
