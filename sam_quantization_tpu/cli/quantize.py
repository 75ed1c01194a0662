"""Quantization CLI — GPTQ / RTN / FQ-ViT calibration and packing.

Flag-parity counterpart of the reference CLIs:
  * gptq4sam.py:500-585 (wbits/groupsize/sym/act-order/true-sequential/
    percdamp/nsamples/nearest);
  * fq_vit/test_quant.py:24-53 (--quant --ptf --lis --quant-method).

Calibration data: an SBD directory if given, else seeded synthetic scenes
(datasets aren't bundled; see data/synthetic.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser(parser=None):
    p = parser or argparse.ArgumentParser("samq-quantize")
    p.add_argument("model", choices=["vit_b", "vit_l", "vit_h", "vit_tiny"])
    p.add_argument("--checkpoint", default=None, help="SAM .pth checkpoint")
    p.add_argument("--save", default=None, help="output artifact directory")
    p.add_argument("--method", default="gptq", choices=["gptq", "rtn", "fq"])
    # GPTQ flags (gptq4sam.py:504-585)
    p.add_argument("--wbits", type=int, default=4, choices=[2, 3, 4, 8, 16])
    p.add_argument("--groupsize", type=int, default=128)
    p.add_argument("--sym", action="store_true")
    p.add_argument("--act-order", action="store_true")
    p.add_argument("--true-sequential", action="store_true", default=True)
    p.add_argument("--no-true-sequential", dest="true_sequential", action="store_false")
    p.add_argument("--percdamp", type=float, default=0.01)
    p.add_argument("--nsamples", type=int, default=16)
    p.add_argument("--nearest", action="store_true", help="RTN instead of GPTQ")
    # FQ flags (fq_vit/test_quant.py:24-53)
    p.add_argument("--ptf", action="store_true", default=True)
    p.add_argument("--no-ptf", dest="ptf", action="store_false")
    p.add_argument("--lis", action="store_true", default=True)
    p.add_argument("--no-lis", dest="lis", action="store_false")
    p.add_argument(
        "--quant-method", default="minmax",
        choices=["minmax", "ema", "omse", "percentile"],
    )
    p.add_argument("--calib-iter", type=int, default=10)
    # mixed precision (PPQ per-op overrides analog, custimized_quant.py:56-147)
    p.add_argument(
        "--overrides", default=None,
        help="JSON file of per-op override rules "
        '([{"pattern": "blocks.7.mlp.*", "bits": 8}, ...])',
    )
    p.add_argument(
        "--bump-worst", type=int, default=0, metavar="K",
        help="diagnose worst-K SNR layers (layerwise analysis at the global "
        "config) and re-quantize them at --bump-bits",
    )
    p.add_argument("--bump-bits", type=int, default=8)
    # int8-MXU serving (BENCHMARKS.md headline config)
    p.add_argument(
        "--act-scales", action="store_true",
        help="calibrate static per-layer activation scales and store them "
        "in the artifact, enabling `infer --serve-int8` (the cached-int8 "
        "+ static-act serving mode; requires --sym)",
    )
    p.add_argument("--act-margin", type=float, default=1.1)
    # data
    p.add_argument("--sbd-dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    return p


def iter_calib_images(args, img_size: int):
    import jax.numpy as jnp

    from sam_quantization_tpu.data.synthetic import synthetic_samples

    if args.sbd_dir:
        from sam_quantization_tpu.data.datasets import SBDDataset, preprocess_for_eval

        ds = SBDDataset(args.sbd_dir, split="train", max_samples=args.nsamples)
        n = 0
        for img, _gt, _i in ds.eval_items():
            x, _ = preprocess_for_eval(img, _gt, img_size)
            yield jnp.asarray(x)
            n += 1
            if n >= args.nsamples:
                return
    else:
        for img, _gt in synthetic_samples(args.nsamples, img_size, args.seed):
            yield jnp.asarray(img)


def main(argv=None):
    from sam_quantization_tpu.cli import add_platform_arg, apply_platform

    p = build_parser()
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)
    import jax

    from sam_quantization_tpu.models import build_sam, sam as sam_lib
    from sam_quantization_tpu.models.configs import CONFIGS
    from sam_quantization_tpu.quant import artifacts, gptq, sequential
    from sam_quantization_tpu.quant.overrides import QuantOverrides

    cfg = CONFIGS[args.model]
    model = build_sam.sam_model_registry[args.model](checkpoint=args.checkpoint)
    ecfg = cfg.image_encoder
    img_size = ecfg.img_size

    overrides = None
    if args.overrides:
        with open(args.overrides) as f:
            overrides = QuantOverrides.from_json(f.read())

    t0 = time.time()
    if args.method == "fq":
        from sam_quantization_tpu.quant.fq.pipeline import (
            FQConfig, calibrate_encoder, fq_quantize_weights,
        )

        fqcfg = FQConfig(
            int_softmax=args.lis, int_norm=args.ptf, observer_a=args.quant_method
        )
        batches = [
            sam_lib.preprocess(model, b)
            for b in iter_calib_images(args, img_size)
        ][: args.calib_iter]
        qparams = calibrate_encoder(
            model.image_encoder, ecfg, fqcfg, batches, overrides=overrides
        )
        enc = fq_quantize_weights(model.image_encoder, fqcfg)
        quant_config = {
            "method": "fq",
            "ptf": args.ptf,
            "lis": args.lis,
            "quant_method": args.quant_method,
            "overrides": overrides.to_json() if overrides else None,
        }
        if args.save:
            import numpy as np

            artifacts.save_quantized(args.save, enc, quant_config)
            np.savez(
                f"{args.save}/fq_qparams.npz",
                **{
                    f"{k}.{i}": np.asarray(v)
                    for k, (s, z) in qparams.items()
                    for i, v in (("scale", s), ("zero", z))
                },
            )
    else:
        qcfg = gptq.GPTQConfig(
            bits=args.wbits,
            groupsize=args.groupsize,
            sym=args.sym,
            actorder=args.act_order,
            percdamp=args.percdamp,
        )
        if args.method == "rtn" or args.nearest:
            enc = sequential.rtn_quantize_encoder(
                model.image_encoder, qcfg, overrides=overrides
            )
            losses = {}
        else:
            batches = [
                sam_lib.preprocess(model, b) for b in iter_calib_images(args, img_size)
            ]
            if args.bump_worst > 0:
                # diagnose → act: quantize once at the global config, rank ops
                # by layerwise SNR, bump the worst K (analysis.py feeding the
                # reference's per-op PPQ decisions)
                from sam_quantization_tpu.quant.analysis import layerwise_error_analyse

                probe = sequential.rtn_quantize_encoder(model.image_encoder, qcfg)
                snrs = layerwise_error_analyse(
                    model.image_encoder, probe, ecfg, batches[:2]
                )
                bump = QuantOverrides.bump_worst_snr(
                    snrs, args.bump_worst, bits=args.bump_bits
                )
                overrides = QuantOverrides(
                    (overrides.rules if overrides else []) + bump.rules
                )
                print(f"bumping worst-{args.bump_worst} SNR ops to "
                      f"{args.bump_bits}-bit: {[p for p, _ in bump.rules]}")
            enc, losses = sequential.gptq_quantize_encoder(
                model.image_encoder, ecfg, batches, qcfg,
                true_sequential=args.true_sequential, verbose=True,
                overrides=overrides,
            )
        quant_config = {
            "method": "rtn" if (args.method == "rtn" or args.nearest) else "gptq",
            "wbits": args.wbits,
            "groupsize": args.groupsize,
            "sym": args.sym,
            "act_order": args.act_order,
            "overrides": overrides.to_json() if overrides else None,
            "losses": {k: float(v) for k, v in losses.items()},
        }
        if args.act_scales:
            if not args.sym:
                print("--act-scales requires --sym (symmetric int8 grid); "
                      "skipping", file=sys.stderr)
            else:
                from sam_quantization_tpu.quant.act_scales import (
                    calibrate_act_scales,
                )

                scale_batches = [
                    sam_lib.preprocess(model, b)
                    for b in iter_calib_images(args, img_size)
                ]
                quant_config["act_scales"] = calibrate_act_scales(
                    model.image_encoder, ecfg, scale_batches,
                    margin=args.act_margin,
                )
        if args.save:
            artifacts.save_quantized(args.save, enc, quant_config)
    print(
        json.dumps(
            {
                "status": "ok",
                "method": quant_config["method"],
                "elapsed_s": round(time.time() - t0, 2),
                "save": args.save,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
