"""Model-export CLI — ONNX / StableHLO / SavedModel artifacts.

Counterpart of the reference's ``scripts/export_onnx_model.py`` (decoder →
ONNX for browser/ORT, :97-200) and ``script/export_onnx.py:45-60`` (encoder
export feeding the PPQ/TRT pipelines), with the TPU-native formats next to
the literal ``.onnx``:

    python -m sam_quantization_tpu.cli.export vit_tiny --format onnx \
        --output decoder.onnx --num-points 8
    python -m sam_quantization_tpu.cli.export vit_b --format savedmodel \
        --part encoder --output enc_sm/
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser("samq-export")
    p.add_argument("model", choices=["vit_b", "vit_l", "vit_h", "vit_tiny"])
    p.add_argument("--checkpoint", default=None, help="FP .pth checkpoint")
    p.add_argument("--output", required=True)
    p.add_argument(
        "--format", choices=["onnx", "stablehlo", "savedmodel"],
        default="onnx",
    )
    p.add_argument("--part", choices=["decoder", "encoder"], default="decoder")
    p.add_argument("--num-points", type=int, default=8)
    p.add_argument(
        "--return-single-mask", action="store_true", default=True,
        help="emit only the best mask (ref export_onnx_model.py flag)",
    )
    p.add_argument(
        "--return-all-masks", dest="return_single_mask",
        action="store_false",
        help="emit all multimask outputs instead of the argmax selection",
    )
    p.add_argument("--use-stability-score", action="store_true")
    p.add_argument("--stability-score-offset", type=float, default=1.0)
    from sam_quantization_tpu.cli import add_platform_arg, apply_platform

    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)

    from sam_quantization_tpu.models import build_sam

    model = build_sam.sam_model_registry[args.model](checkpoint=args.checkpoint)
    out = {"format": args.format, "part": args.part, "output": args.output}

    if args.format == "onnx":
        from sam_quantization_tpu import export_onnx

        if args.part == "decoder":
            blob = export_onnx.export_decoder_onnx(
                model, args.output,
                num_points=args.num_points,
                return_single_mask=args.return_single_mask,
                use_stability_score=args.use_stability_score,
                stability_score_offset=args.stability_score_offset,
            )
        else:
            # encoder ONNX — the reference PPQ path's artifact
            # (script/custimized_quant.py:334-344)
            blob = export_onnx.export_encoder_onnx(model, args.output)
        out["bytes"] = len(blob)
        out["opset"] = 11
    elif args.format == "stablehlo":
        from sam_quantization_tpu import export as ex

        blob = (
            ex.export_decoder(model, args.output, num_points=args.num_points,
                              return_single_mask=args.return_single_mask)
            if args.part == "decoder"
            else ex.export_encoder(model, args.output)
        )
        out["bytes"] = len(blob)
    else:
        from sam_quantization_tpu import export as ex

        manifest = (
            ex.export_decoder_savedmodel(model, args.output,
                                         num_points=args.num_points)
            if args.part == "decoder"
            else ex.export_encoder_savedmodel(model, args.output)
        )
        out["manifest"] = manifest

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
