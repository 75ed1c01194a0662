"""Quantized-inference CLI: load artifacts, bench speed, run click eval.

Counterpart of the reference's gptq4sam_infer.py:59-225 (bench_speed + the
5-click evaluation) and of origin_infer.sh's FP path.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser("samq-infer")
    p.add_argument("model", choices=["vit_b", "vit_l", "vit_h", "vit_tiny"])
    p.add_argument("--checkpoint", default=None, help="FP .pth checkpoint")
    p.add_argument("--load", default=None, help="quantized artifact dir")
    p.add_argument(
        "--serve-int8", action="store_true",
        help="convert the loaded symmetric-GPTQ/RTN encoder to the "
        "int8-MXU serving mode (cached int8 weights + the artifact's "
        "static activation scales + per-op bf16 routing) — the headline "
        "config in BENCHMARKS.md",
    )
    p.add_argument("--benchmark", action="store_true")
    p.add_argument("--bench-iters", type=int, default=100)
    p.add_argument("--bench-warmup", type=int, default=25)
    p.add_argument("--eval", action="store_true", help="run 5-click eval")
    p.add_argument("--num-clicks", type=int, default=5)
    p.add_argument("--num-samples", type=int, default=20)
    p.add_argument("--sbd-dir", default=None)
    p.add_argument("--seed", type=int, default=42)
    from sam_quantization_tpu.cli import (
        add_platform_arg, add_scoped_vmem_arg, apply_platform,
        apply_scoped_vmem,
    )

    add_platform_arg(p)
    add_scoped_vmem_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)

    import jax
    import jax.numpy as jnp

    from sam_quantization_tpu.evaluation import click_eval
    from sam_quantization_tpu.models import build_sam, sam as sam_lib
    from sam_quantization_tpu.quant import artifacts

    model = build_sam.sam_model_registry[args.model](checkpoint=args.checkpoint)
    apply_scoped_vmem(args, model.config.image_encoder.embed_dim)
    ctx = None
    if args.load:
        enc, qcfg = artifacts.load_quantized(args.load)
        model = sam_lib.Sam(
            image_encoder=enc,
            prompt_encoder=model.prompt_encoder,
            mask_decoder=model.mask_decoder,
            config=model.config,
        )
        print(f"loaded quantized encoder: {qcfg.get('method')}", file=sys.stderr)
        if args.serve_int8:
            if qcfg.get("method") not in ("gptq", "rtn") or not qcfg.get("sym"):
                print("--serve-int8 needs a symmetric gptq/rtn artifact "
                      "(quantize with --sym); ignoring", file=sys.stderr)
            else:
                from sam_quantization_tpu.models.configs import CONFIGS
                from sam_quantization_tpu.nn.packed import (
                    cache_int8, default_serve_skip,
                )

                scales = qcfg.get("act_scales")
                ecfg_ = CONFIGS[args.model].image_encoder
                enc = cache_int8(
                    enc, act_scales=scales,
                    skip=default_serve_skip(ecfg_.embed_dim),
                )
                model = sam_lib.Sam(
                    image_encoder=enc,
                    prompt_encoder=model.prompt_encoder,
                    mask_decoder=model.mask_decoder,
                    config=model.config,
                )
                print(
                    "serving mode: cached int8 weights"
                    + (", static act scales" if scales else
                       ", dynamic act scales (artifact has none — "
                       "quantize with --act-scales)"),
                    file=sys.stderr,
                )
        if qcfg.get("method") == "fq":
            import os

            import numpy as np

            from sam_quantization_tpu.quant.fq.pipeline import FQConfig, FQCtx

            qp_path = os.path.join(args.load, "fq_qparams.npz")
            if os.path.exists(qp_path):
                raw = np.load(qp_path)
                qparams = {}
                for key in raw.files:
                    path, kind = key.rsplit(".", 1)
                    s, z = qparams.get(path, (None, None))
                    if kind == "scale":
                        s = jnp.asarray(raw[key])
                    else:
                        z = jnp.asarray(raw[key])
                    qparams[path] = (s, z)
                fqcfg = FQConfig(
                    int_softmax=qcfg.get("lis", True),
                    int_norm=qcfg.get("ptf", True),
                    observer_a=qcfg.get("quant_method", "minmax"),
                )
                ctx = FQCtx("quant", fqcfg, qparams=qparams)
                print("loaded FQ activation qparams", file=sys.stderr)

    out = {}
    size = model.config.image_encoder.img_size
    from sam_quantization_tpu.quant.context import NULL_CTX

    use_ctx = ctx or NULL_CTX
    attn = "xla" if ctx is not None else "auto"
    if args.benchmark:
        # counterpart of bench_speed (gptq4sam_infer.py:59-79)
        from sam_quantization_tpu.ops.flash_attention import scoped_jit

        fn = scoped_jit(
            lambda x: sam_lib.encode_image(model, x, use_ctx, attn_impl=attn)
        )
        x = jnp.zeros((1, size, size, 3), jnp.bfloat16)
        for _ in range(args.bench_warmup):
            r = fn(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(args.bench_iters):
            r = fn(x)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / args.bench_iters
        out["encoder_s_per_image"] = round(dt, 5)
        out["encoder_images_per_s"] = round(1.0 / dt, 3)

    if args.eval:
        encode, decode = click_eval.make_sam_backend(model, ctx=ctx)
        if args.sbd_dir:
            from sam_quantization_tpu.data.datasets import (
                SBDDataset, preprocess_for_eval,
            )

            ds = SBDDataset(args.sbd_dir, split="val", max_samples=args.num_samples)

            def samples():
                n = 0
                for img, gt, _ in ds.eval_items():
                    yield preprocess_for_eval(img, gt, size)
                    n += 1
                    if n >= args.num_samples:
                        return
        else:
            from sam_quantization_tpu.data.synthetic import synthetic_samples

            def samples():
                yield from synthetic_samples(args.num_samples, size, args.seed)

        res = click_eval.click_loop_eval(
            encode, decode, samples(), num_clicks=args.num_clicks,
            img_size=size, seed=args.seed,
        )
        out["mean_iou_per_click"] = [round(v, 4) for v in res.mean_ious]
        out[f"click@1"] = round(res.click1, 4)
        out[f"click@{args.num_clicks}"] = round(res.final, 4)
        out["s_per_image"] = round(res.seconds_per_image, 3)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
