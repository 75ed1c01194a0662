"""SamAutomaticMaskGenerator: grid-prompted whole-image segmentation.

Capability counterpart of ``segment_anything/automatic_mask_generator.py:35-372``:
32×32 point grid, batched prediction (64 points/batch), IoU + stability
filtering, box NMS, crop layers, RLE/binary output, small-region removal.

TPU notes: each 64-point batch is ONE decode over 64 prompts (batch axis),
so the decoder runs as a single fixed-shape XLA program per batch; all
dynamic-shape filtering (thresholds, NMS, dedup) happens on host numpy
between device calls.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sam_quantization_tpu.models import sam as sam_lib
from sam_quantization_tpu.predictor import SamPredictor
from sam_quantization_tpu import native
from sam_quantization_tpu.utils import amg as amg_utils


class SamAutomaticMaskGenerator:
    def __init__(
        self,
        model: sam_lib.Sam,
        points_per_side: Optional[int] = 32,
        points_per_batch: int = 64,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 1.0,
        box_nms_thresh: float = 0.7,
        crop_n_layers: int = 0,
        crop_nms_thresh: float = 0.7,
        crop_overlap_ratio: float = 512 / 1500,
        crop_n_points_downscale_factor: int = 1,
        point_grids: Optional[List[np.ndarray]] = None,
        min_mask_region_area: int = 0,
        output_mode: str = "binary_mask",
        attn_impl: str = "auto",
        mesh=None,
    ):
        """``mesh``: optional jax.sharding.Mesh — the per-batch 64-prompt
        decode shards over its "dp" axis (the single-host slice of
        SURVEY §7's multi-host AMG batching; images themselves stream through
        parallel/serving.py across hosts)."""
        assert (points_per_side is None) != (point_grids is None), (
            "Exactly one of points_per_side or point_grids must be provided."
        )
        if points_per_side is not None:
            self.point_grids = amg_utils.build_all_layer_point_grids(
                points_per_side, crop_n_layers, crop_n_points_downscale_factor
            )
        else:
            self.point_grids = point_grids
        assert output_mode in ("binary_mask", "uncompressed_rle")
        self.predictor = SamPredictor(model, attn_impl=attn_impl)
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.min_mask_region_area = min_mask_region_area
        self.output_mode = output_mode
        self._dp_sharding = None
        # distinct original sizes the packed fast path has compiled for
        # (see _process_batch: each size is a fresh whole-program compile)
        self._packed_sizes: set = set()
        self._packed_size_cap = 4
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._dp_sharding = NamedSharding(mesh, P("dp"))

    def generate(self, image: np.ndarray) -> List[Dict[str, Any]]:
        """(H, W, 3) uint8 RGB → list of mask records (ref generate,
        automatic_mask_generator.py:131-198)."""
        mask_data = self._generate_masks(image)
        if self.min_mask_region_area > 0:
            mask_data = self.postprocess_small_regions(
                mask_data,
                self.min_mask_region_area,
                max(self.box_nms_thresh, self.crop_nms_thresh),
            )
        if self.output_mode == "binary_mask":
            mask_data["segmentations"] = [
                amg_utils.rle_to_mask(r) for r in mask_data["rles"]
            ]
        else:
            mask_data["segmentations"] = mask_data["rles"]
        anns = []
        for idx in range(len(mask_data["segmentations"])):
            anns.append(
                {
                    "segmentation": mask_data["segmentations"][idx],
                    "area": amg_utils.area_from_rle(mask_data["rles"][idx]),
                    "bbox": amg_utils.box_xyxy_to_xywh(mask_data["boxes"][idx]).tolist(),
                    "predicted_iou": float(mask_data["iou_preds"][idx]),
                    "point_coords": [mask_data["points"][idx].tolist()],
                    "stability_score": float(mask_data["stability_score"][idx]),
                    "crop_box": amg_utils.box_xyxy_to_xywh(
                        np.asarray(mask_data["crop_boxes"][idx], np.float32)
                    ).tolist(),
                }
            )
        return anns

    def _generate_masks(self, image: np.ndarray) -> amg_utils.MaskData:
        orig_size = image.shape[:2]
        crop_boxes, layer_idxs = amg_utils.generate_crop_boxes(
            orig_size, self.crop_n_layers, self.crop_overlap_ratio
        )
        data = amg_utils.MaskData()
        for crop_box, layer_idx in zip(crop_boxes, layer_idxs):
            crop_data = self._process_crop(image, crop_box, layer_idx, orig_size)
            data.cat(crop_data)
        if len(crop_boxes) > 1:
            # Prefer masks from smaller crops (ref :173-179)
            scores = 1.0 / _box_area(np.asarray(data["crop_boxes"], np.float32))
            keep = native.box_nms(
                data["boxes"].astype(np.float32), scores.astype(np.float32),
                self.crop_nms_thresh,
            )
            data.filter(keep)
        return data

    def _process_crop(
        self, image, crop_box: List[int], crop_layer_idx: int, orig_size
    ) -> amg_utils.MaskData:
        x0, y0, x1, y1 = crop_box
        cropped_im = image[y0:y1, x0:x1, :]
        cropped_im_size = cropped_im.shape[:2]
        self.predictor.set_image(cropped_im)
        points_scale = np.array(cropped_im_size)[None, ::-1]
        points_for_image = self.point_grids[crop_layer_idx] * points_scale

        data = amg_utils.MaskData()
        for (points,) in amg_utils.batch_iterator(self.points_per_batch, points_for_image):
            batch_data = self._process_batch(
                points, cropped_im_size, crop_box, orig_size
            )
            data.cat(batch_data)
        self.predictor.reset_image()

        keep = native.box_nms(
            data["boxes"].astype(np.float32),
            data["iou_preds"].astype(np.float32),
            self.box_nms_thresh,
        )
        data.filter(keep)
        data["boxes"] = amg_utils.uncrop_boxes_xyxy(data["boxes"], crop_box)
        data["points"] = amg_utils.uncrop_points(data["points"], crop_box)
        data["crop_boxes"] = [crop_box for _ in range(len(data["rles"]))]
        return data

    def _process_batch(
        self, points: np.ndarray, im_size, crop_box, orig_size
    ) -> amg_utils.MaskData:
        """One fixed-shape decode over a batch of single-point prompts
        (ref _process_batch, automatic_mask_generator.py:277-320)."""
        orig_h, orig_w = orig_size
        transform = self.predictor.transform
        in_points = transform.apply_coords(points, im_size)
        n = len(points)
        coords = np.zeros((self.points_per_batch, 2, 2), np.float32)
        labels = -np.ones((self.points_per_batch, 2), np.float32)
        coords[:n, 0] = in_points
        labels[:n, 0] = 1.0

        coords_j, labels_j = jnp.asarray(coords), jnp.asarray(labels)
        if self._dp_sharding is not None:
            coords_j = jax.device_put(coords_j, self._dp_sharding)
            labels_j = jax.device_put(labels_j, self._dp_sharding)
        # Full-crop fast path: threshold/stability/boxes/bit-pack on device,
        # transfer packed bits (8x smaller), RLE straight off the packed
        # bytes. uncrop_masks is the identity here, so behavior matches the
        # general path below (parity-tested in test_export_and_amg).
        import os

        full_crop = (
            list(crop_box) == [0, 0, orig_w, orig_h]
            and tuple(im_size) == tuple(orig_size)
            and os.environ.get("SAMQ_AMG_PACKED") != "0"
        )
        if full_crop:
            # _batched_decode_packed compiles the whole decode+postprocess
            # per DISTINCT original size (static shapes). A fixed-size
            # serving stream pays one compile; a mixed-size dataset would
            # recompile per image and grow the jit cache unboundedly — cap
            # the distinct sizes this instance compiles for and fall back
            # to the general path past the cap.
            sz = (int(orig_h), int(orig_w))
            if sz not in self._packed_sizes:
                if len(self._packed_sizes) >= self._packed_size_cap:
                    full_crop = False
                else:
                    self._packed_sizes.add(sz)
        if full_crop:
            packed, iou_p, stab, boxes = _batched_decode_packed(
                self.predictor.model,
                self.predictor.features,
                coords_j,
                labels_j,
                tuple(self.predictor.input_size),
                tuple(im_size),
                float(self.predictor.model.config.mask_threshold),
                float(self.stability_score_offset),
            )
            m = n * 3
            packed_np = np.asarray(packed[:m])
            data = amg_utils.MaskData(
                packed=packed_np,
                iou_preds=np.asarray(iou_p[:m]).reshape(-1),
                stability_score=np.asarray(stab[:m]).reshape(-1),
                boxes=np.asarray(boxes[:m]),
                points=np.repeat(points, 3, axis=0)[:m],
            )
            if self.pred_iou_thresh > 0.0:
                data.filter(data["iou_preds"] > self.pred_iou_thresh)
            if self.stability_score_thresh > 0.0:
                data.filter(
                    data["stability_score"] >= self.stability_score_thresh
                )
            keep = ~amg_utils.is_box_near_crop_edge(
                data["boxes"], crop_box, [0, 0, orig_w, orig_h]
            )
            if not keep.all():
                data.filter(keep)
            counts = native.rle_encode_batch_packed(
                data["packed"], orig_h, orig_w
            )
            data["rles"] = [
                {"size": [orig_h, orig_w], "counts": c} for c in counts
            ]
            del data["packed"]
            return data
        low_res, iou_preds = _batched_decode(
            self.predictor.model,
            self.predictor.features,
            coords_j,
            labels_j,
        )
        masks = sam_lib.postprocess_masks(
            self.predictor.model, low_res, self.predictor.input_size, im_size
        )
        masks = np.asarray(masks[:n]).reshape(-1, *masks.shape[-2:])
        iou_preds = np.asarray(iou_preds[:n]).reshape(-1)
        data = amg_utils.MaskData(
            masks=masks,
            iou_preds=iou_preds,
            points=np.repeat(points, 3, axis=0)[: len(masks)],
        )

        if self.pred_iou_thresh > 0.0:
            keep = data["iou_preds"] > self.pred_iou_thresh
            data.filter(keep)
        data["stability_score"] = amg_utils.calculate_stability_score(
            data["masks"], self.predictor.model.mask_threshold,
            self.stability_score_offset,
        )
        if self.stability_score_thresh > 0.0:
            keep = data["stability_score"] >= self.stability_score_thresh
            data.filter(keep)

        data["masks"] = data["masks"] > self.predictor.model.mask_threshold
        data["boxes"] = amg_utils.batched_mask_to_box(data["masks"])
        keep = ~amg_utils.is_box_near_crop_edge(
            data["boxes"], crop_box, [0, 0, orig_w, orig_h]
        )
        if not keep.all():
            data.filter(keep)
        data["masks"] = amg_utils.uncrop_masks(data["masks"], crop_box, orig_h, orig_w)
        # threaded C++ batch encode — the per-mask loop was the dominant
        # AMG host stage (tools/amg_bench.py round 4)
        counts = native.rle_encode_batch(np.asarray(data["masks"], np.uint8))
        data["rles"] = [
            {"size": [orig_h, orig_w], "counts": c} for c in counts
        ]
        del data["masks"]
        return data

    @staticmethod
    def postprocess_small_regions(
        mask_data: amg_utils.MaskData, min_area: int, nms_thresh: float
    ) -> amg_utils.MaskData:
        """ref postprocess_small_regions, automatic_mask_generator.py:322-372."""
        if len(mask_data["rles"]) == 0:
            return mask_data
        new_masks = []
        scores = []
        for rle in mask_data["rles"]:
            mask = amg_utils.rle_to_mask(rle)
            mask, changed = amg_utils.remove_small_regions(mask, min_area, "holes")
            unchanged = not changed
            mask, changed = amg_utils.remove_small_regions(mask, min_area, "islands")
            unchanged = unchanged and not changed
            new_masks.append(mask)
            scores.append(float(unchanged))
        masks = np.stack(new_masks, axis=0)
        boxes = amg_utils.batched_mask_to_box(masks)
        keep = native.box_nms(
            boxes.astype(np.float32), np.asarray(scores, np.float32), nms_thresh
        )
        for i in keep:
            if scores[i] == 0.0:
                mask_data["rles"][i] = amg_utils.mask_to_rle(masks[i])
                mask_data["boxes"][i] = boxes[i]
        mask_data.filter(keep)
        return mask_data


def _box_area(boxes: np.ndarray) -> np.ndarray:
    return np.maximum(boxes[:, 2] - boxes[:, 0], 1e-6) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 1e-6
    )


import functools


@functools.partial(jax.jit)
def _batched_decode(model, features, coords, labels):
    """64 single-point prompts → 3 multimask outputs each, one XLA program."""
    low_res, iou = sam_lib.decode_masks(
        model, features, points=(coords, labels), multimask_output=True
    )
    return low_res, iou


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _batched_decode_packed(
    model, features, coords, labels, input_size, im_size, thr, off
):
    """Full-crop AMG batch as ONE device program INCLUDING the mask
    postprocess: decode → full-res upsample → stability score → threshold →
    boxes → column-major bit-pack. The host receives 8× fewer mask bytes
    (packbits) and the C++ RLE consumes them without unpacking
    (native.rle_encode_batch_packed) — the round-4 AMG mask transfer was the
    dominant real cost (192 MB bool / 7.7 s over the tunnel per batch;
    tools/amg_bench.py), and this shrinks it to 24 MB with no new host work.
    """
    low_res, iou = sam_lib.decode_masks(
        model, features, points=(coords, labels), multimask_output=True
    )
    masks = sam_lib.postprocess_masks(model, low_res, input_size, im_size)
    H, W = im_size
    masks = masks.reshape(-1, H, W)
    hi = jnp.sum(masks > (thr + off), axis=(1, 2))
    lo = jnp.sum(masks > (thr - off), axis=(1, 2))
    stability = hi / jnp.maximum(lo, 1)
    binm = masks > thr
    # boxes, matching utils/amg.batched_mask_to_box incl. empty → zeros
    in_h = jnp.any(binm, axis=2)  # (M, H)
    in_w = jnp.any(binm, axis=1)  # (M, W)
    ys = jnp.arange(H)[None, :]
    xs = jnp.arange(W)[None, :]
    bottom = jnp.max(in_h * ys, axis=-1)
    top = jnp.min(jnp.where(in_h, ys, H), axis=-1)
    right = jnp.max(in_w * xs, axis=-1)
    left = jnp.min(jnp.where(in_w, xs, W), axis=-1)
    empty = (left > right) | (top > bottom)
    boxes = jnp.stack([left, top, right, bottom], axis=-1)
    boxes = jnp.where(empty[:, None], 0, boxes).astype(jnp.float32)
    packed = amg_utils.packbits_masks(binm)
    return packed, iou.reshape(-1), stability, boxes
