"""Diagnose→act on the fully-integer FQ path (VERDICT r2 weak #3).

QUALITY.json round 2: fq_int8 (int-LN + LIS live) costs NoC@90 4.67 vs
fp32's 2.50 and ~1pt of 1-click mIoU, and the per-op override machinery was
never pointed at it. This tool (a) ablates the candidate damage sources
(LIS output bits, activation observer, int-LN), (b) runs the pointwise-SNR
diagnosis (quant.fq.pipeline.fq_pointwise_snr — the FQ analog of the
reference's graphwise_error_analyse, script/analysis.py:596-625), and
(c) evaluates override sets built from the diagnosis. The winning recipe
is codified as ``fq_int8_tuned`` in tools/quality_table.py.

    python tools/fq_tune.py --configs base s8 omse diag8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser("fq-tune")
    ap.add_argument("--ckpt", default="checkpoints/vit_tiny_synth")
    ap.add_argument("--model", default="vit_tiny")
    ap.add_argument("--eval-samples", type=int, default=24)
    ap.add_argument("--calib-samples", type=int, default=8)
    ap.add_argument("--noc-clicks", type=int, default=12)
    ap.add_argument("--configs", nargs="*", default=["base", "s8", "diag8"])
    ap.add_argument("--snr-report", action="store_true",
                    help="print the worst-SNR observation points and exit")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sam_quantization_tpu.data.synthetic import synthetic_samples
    from sam_quantization_tpu.evaluation import click_eval
    from sam_quantization_tpu.models import sam as sam_lib
    from sam_quantization_tpu.models.configs import CONFIGS
    from sam_quantization_tpu.quant.bit_type import BIT_TYPE_DICT
    from sam_quantization_tpu.quant.fq.pipeline import (
        FQConfig, calibrate_sam, fq_pointwise_snr, quantize_sam,
    )
    from sam_quantization_tpu.quant.overrides import QuantOverrides
    from sam_quantization_tpu.train import checkpoint as ckpt_lib
    from sam_quantization_tpu.train import trainer

    cfg = CONFIGS[args.model]
    size = cfg.image_encoder.img_size
    template = sam_lib.init(jax.random.PRNGKey(0), cfg)
    opt_t = trainer.make_optimizer(trainer.TrainConfig()).init(template)
    model, _, step = ckpt_lib.load_checkpoint(args.ckpt, template, opt_t, "best")
    model = jax.tree_util.tree_map(jnp.asarray, model)

    eval_samples = list(synthetic_samples(args.eval_samples, size, seed=9999))
    calib_sam = list(synthetic_samples(args.calib_samples, size, seed=777))

    def evaluate(qmodel, make_ctx):
        ctx = make_ctx()
        encode_raw, decode = click_eval.make_sam_backend(
            qmodel, ctx=ctx, attn_impl="xla"
        )
        encode = lambda x: encode_raw(sam_lib.preprocess(qmodel, x))
        res = click_eval.click_loop_eval(
            encode, decode, eval_samples, num_clicks=5, img_size=size, seed=123
        )
        noc_res = click_eval.click_loop_eval(
            encode, decode, eval_samples, num_clicks=args.noc_clicks,
            img_size=size, seed=321,
        )
        arr = np.asarray(noc_res.per_sample_ious)
        noc = {}
        for thr in (0.85, 0.90):
            reach = arr >= thr
            first = np.where(
                reach.any(axis=1), reach.argmax(axis=1) + 1, args.noc_clicks
            )
            noc[f"noc@{int(thr * 100)}"] = float(first.mean())
        return res, noc

    def build(fqcfg: FQConfig, overrides=None, diag=0, diag_action=None):
        qparams = calibrate_sam(model, calib_sam, fqcfg, overrides=overrides)
        qmodel, make_ctx = quantize_sam(model, fqcfg, qparams,
                                        overrides=overrides)
        if diag:
            snr = fq_pointwise_snr(qmodel, calib_sam[:2], fqcfg, qparams)
            worst = list(snr.items())[:diag]
            print(f"  worst-{diag} SNR points:",
                  [(k, round(v, 1)) for k, v in worst])
            ov = QuantOverrides(overrides.rules if overrides else [])
            for path, _db in worst:
                if diag_action == "skip":
                    ov.add(path, skip=True)
                else:
                    ov.add(path, observer=diag_action or "omse")
            qparams = calibrate_sam(model, calib_sam, fqcfg, overrides=ov)
            qmodel, make_ctx = quantize_sam(model, fqcfg, qparams,
                                            overrides=ov)
        return qmodel, make_ctx

    variants = {
        "base": lambda: build(FQConfig()),
        "s8": lambda: build(FQConfig(bit_s=BIT_TYPE_DICT["uint8"])),
        "omse": lambda: build(FQConfig(observer_a="omse")),
        "pct": lambda: build(FQConfig(observer_a="percentile")),
        "noLIS": lambda: build(FQConfig(int_softmax=False)),
        "noIntNorm": lambda: build(FQConfig(int_norm=False)),
        "diag8": lambda: build(FQConfig(), diag=8, diag_action="omse"),
        "diag8_pct": lambda: build(FQConfig(), diag=8, diag_action="percentile"),
        "diag4_skip": lambda: build(FQConfig(), diag=4, diag_action="skip"),
        "diag8_skip": lambda: build(FQConfig(), diag=8, diag_action="skip"),
        "diag12_skip": lambda: build(FQConfig(), diag=12, diag_action="skip"),
        "s8_diag8": lambda: build(
            FQConfig(bit_s=BIT_TYPE_DICT["uint8"]), diag=8, diag_action="omse"
        ),
        "s8_omse": lambda: build(
            FQConfig(bit_s=BIT_TYPE_DICT["uint8"], observer_a="omse")
        ),
    }

    if args.snr_report:
        fqcfg = FQConfig()
        qparams = calibrate_sam(model, calib_sam, fqcfg)
        qmodel, _ = quantize_sam(model, fqcfg, qparams)
        snr = fq_pointwise_snr(qmodel, calib_sam[:4], fqcfg, qparams)
        for k, v in snr.items():
            print(f"  {v:7.2f} dB  {k}")
        return

    rows = {}
    for name in args.configs:
        qmodel, make_ctx = variants[name]()
        res, noc = evaluate(qmodel, make_ctx)
        rows[name] = {
            "click1": round(res.click1, 4), "click5": round(res.final, 4),
            **{k: round(v, 2) for k, v in noc.items()},
        }
        print(name, rows[name], flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
