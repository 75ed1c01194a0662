"""Automatic-mask-generation CLI: images in → masks out.

Flag-parity counterpart of the reference's scripts/amg.py:1-240 (identical
copy at script/amg.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser():
    p = argparse.ArgumentParser("samq-amg")
    p.add_argument("--input", required=True, help="image file or directory")
    p.add_argument("--output", required=True)
    p.add_argument("--model-type", default="vit_h")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--load-quantized", default=None)
    p.add_argument("--convert-to-rle", action="store_true")
    # AMG knobs (scripts/amg.py:66-153)
    p.add_argument("--points-per-side", type=int, default=32)
    p.add_argument("--points-per-batch", type=int, default=64)
    p.add_argument("--pred-iou-thresh", type=float, default=0.88)
    p.add_argument("--stability-score-thresh", type=float, default=0.95)
    p.add_argument("--stability-score-offset", type=float, default=1.0)
    p.add_argument("--box-nms-thresh", type=float, default=0.7)
    p.add_argument("--crop-n-layers", type=int, default=0)
    p.add_argument("--crop-nms-thresh", type=float, default=0.7)
    p.add_argument("--crop-overlap-ratio", type=float, default=512 / 1500)
    p.add_argument("--crop-n-points-downscale-factor", type=int, default=1)
    p.add_argument("--min-mask-region-area", type=int, default=0)
    return p


def write_masks_to_folder(masks, path: str):
    """PNG-free mask dump: one .npy per mask + metadata.csv
    (ref write_masks_to_folder, scripts/amg.py:156-186)."""
    import numpy as np

    header = (
        "id,area,bbox_x0,bbox_y0,bbox_w,bbox_h,point_input_x,point_input_y,"
        "predicted_iou,stability_score,crop_box_x0,crop_box_y0,crop_box_w,crop_box_h"
    )
    metadata = [header]
    for i, mask_data in enumerate(masks):
        mask = mask_data["segmentation"]
        np.save(os.path.join(path, f"{i}.npy"), mask)
        md = [
            str(i),
            str(mask_data["area"]),
            *[str(x) for x in mask_data["bbox"]],
            *[str(x) for x in mask_data["point_coords"][0]],
            str(mask_data["predicted_iou"]),
            str(mask_data["stability_score"]),
            *[str(x) for x in mask_data["crop_box"]],
        ]
        metadata.append(",".join(md))
    with open(os.path.join(path, "metadata.csv"), "w") as f:
        f.write("\n".join(metadata))


def main(argv=None):
    from sam_quantization_tpu.cli import add_platform_arg, apply_platform

    p = build_parser()
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)
    import numpy as np

    from sam_quantization_tpu.automatic_mask_generator import SamAutomaticMaskGenerator
    from sam_quantization_tpu.models import build_sam, sam as sam_lib
    from sam_quantization_tpu.quant import artifacts

    model = build_sam.sam_model_registry[args.model_type](checkpoint=args.checkpoint)
    if args.load_quantized:
        enc, _ = artifacts.load_quantized(args.load_quantized)
        model = sam_lib.Sam(
            image_encoder=enc,
            prompt_encoder=model.prompt_encoder,
            mask_decoder=model.mask_decoder,
            config=model.config,
        )
    output_mode = "uncompressed_rle" if args.convert_to_rle else "binary_mask"
    generator = SamAutomaticMaskGenerator(
        model,
        points_per_side=args.points_per_side,
        points_per_batch=args.points_per_batch,
        pred_iou_thresh=args.pred_iou_thresh,
        stability_score_thresh=args.stability_score_thresh,
        stability_score_offset=args.stability_score_offset,
        box_nms_thresh=args.box_nms_thresh,
        crop_n_layers=args.crop_n_layers,
        crop_nms_thresh=args.crop_nms_thresh,
        crop_overlap_ratio=args.crop_overlap_ratio,
        crop_n_points_downscale_factor=args.crop_n_points_downscale_factor,
        min_mask_region_area=args.min_mask_region_area,
        output_mode=output_mode,
    )

    if not os.path.isdir(args.input):
        targets = [args.input]
    else:
        targets = [
            os.path.join(args.input, f)
            for f in sorted(os.listdir(args.input))
            if not os.path.isdir(os.path.join(args.input, f))
        ]
    os.makedirs(args.output, exist_ok=True)

    from sam_quantization_tpu.data.datasets import _imread

    for t in targets:
        print(f"Processing '{t}'...", file=sys.stderr)
        if t.endswith(".npy"):
            image = np.load(t)
        else:
            image = _imread(t)
        masks = generator.generate(image)
        base = os.path.splitext(os.path.basename(t))[0]
        if output_mode == "binary_mask":
            save_base = os.path.join(args.output, base)
            os.makedirs(save_base, exist_ok=True)
            write_masks_to_folder(masks, save_base)
        else:
            with open(os.path.join(args.output, base + ".json"), "w") as f:
                json.dump(masks, f)
    print("Done!", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
