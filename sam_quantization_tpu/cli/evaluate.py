"""NoC evaluation CLI — counterpart of scripts/evaluate_model.py:24-486.

Datasets: GrabCut/Berkeley/DAVIS-style image+mask folders, SBD; modes:
NoC@80/85/90 with distance-transform clicks, optional flip TTA / zoom-in /
input-BRS refinement.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser("samq-evaluate")
    p.add_argument("model", choices=["vit_b", "vit_l", "vit_h", "vit_tiny"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--load", default=None, help="quantized artifact dir")
    p.add_argument("--datasets", default="synthetic",
                   help="comma list: synthetic,synthetic_hard,"
                        "GrabCut,Berkeley,DAVIS,"
                        "COCO_MVal,PascalVOC,SBD,<folder-name> (named "
                        "benchmarks resolve their path from config.yml "
                        "unless --dataset-path overrides; flag parity with "
                        "scripts/evaluate_model.py --datasets)")
    p.add_argument("--dataset-path", default=None)
    p.add_argument("--n-clicks", type=int, default=20)
    p.add_argument("--thresh", type=float, default=0.5)
    p.add_argument("--num-samples", type=int, default=20)
    p.add_argument("--mode", default="NoBRS",
                   choices=["NoBRS", "f-BRS", "InputBRS"],
                   )
    p.add_argument("--with-flip", action="store_true")
    p.add_argument("--zoom-in", action="store_true")
    p.add_argument("--crops", default=None, metavar="HxW",
                   help="tiled-crop TTA, e.g. 320x480 (ref eval-mode "
                        "'fixed<crop>', scripts/evaluate_model.py)")
    from sam_quantization_tpu.cli import add_platform_arg, apply_platform

    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)

    from sam_quantization_tpu.data.datasets import (
        ImageMaskDataset, get_dataset, preprocess_for_eval,
    )
    from sam_quantization_tpu.data.synthetic import synthetic_samples
    from sam_quantization_tpu.evaluation import click_eval, metrics
    from sam_quantization_tpu.models import build_sam, sam as sam_lib
    from sam_quantization_tpu.quant import artifacts

    model = build_sam.sam_model_registry[args.model](checkpoint=args.checkpoint)
    if args.load:
        enc, _ = artifacts.load_quantized(args.load)
        model = sam_lib.Sam(
            image_encoder=enc,
            prompt_encoder=model.prompt_encoder,
            mask_decoder=model.mask_decoder,
            config=model.config,
        )
    size = model.config.image_encoder.img_size
    use_predictor = (
        args.mode != "NoBRS" or args.with_flip or args.zoom_in or args.crops
    )
    if use_predictor:
        from sam_quantization_tpu.evaluation.predictors import (
            Crops, FeatureBRSPredictor, InputBRSPredictor, SamEvalPredictor,
            ZoomIn,
        )
        from sam_quantization_tpu.predictor import SamPredictor

        crops = None
        if args.crops:
            ch, cw = (int(v) for v in args.crops.lower().split("x"))
            crops = Crops(crop_size=(ch, cw))
        base = SamPredictor(model)
        kw = dict(
            with_flip=args.with_flip,
            zoom_in=ZoomIn(target_size=size) if args.zoom_in else None,
            crops=crops,
        )
        if args.mode == "InputBRS":
            eval_pred = InputBRSPredictor(base, **kw)
        elif args.mode == "f-BRS":
            eval_pred = FeatureBRSPredictor(base, **kw)
        else:
            eval_pred = SamEvalPredictor(base, **kw)
    else:
        encode, decode = click_eval.make_sam_backend(model)

    for name in args.datasets.split(","):
        if name in ("synthetic", "synthetic_hard"):
            style = "hard" if name.endswith("_hard") else "easy"

            def samples(style=style):
                yield from synthetic_samples(
                    args.num_samples, size, 0, style=style
                )
        else:
            # named benchmark registry (GrabCut/Berkeley/DAVIS/COCO_MVal/
            # PascalVOC/SBD — ref inference/utils.py:48-66), else a generic
            # images/+masks/ folder at --dataset-path
            ds = get_dataset(name, args.dataset_path)
            if ds is None:
                ds = ImageMaskDataset(args.dataset_path)

            def samples(ds=ds):
                n = 0
                for img, gt, _ in ds.eval_items():
                    yield preprocess_for_eval(img, gt, size)
                    n += 1
                    if n >= args.num_samples:
                        return

        t0 = time.time()
        if use_predictor:
            noc, over, spc = click_eval.noc_eval_predictor(
                eval_pred, samples(), max_clicks=args.n_clicks,
                pred_thr=args.thresh,
            )
        else:
            noc, over, spc = click_eval.noc_eval(
                encode, decode, samples(), max_clicks=args.n_clicks, img_size=size
            )
        print(
            metrics.results_table(
                noc, over, name, spc, time.time() - t0, args.num_samples,
                max_clicks=args.n_clicks,
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
