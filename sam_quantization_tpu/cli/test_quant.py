"""FQ-ViT classifier quantization CLI — counterpart of fq_vit/test_quant.py.

Calibrates a ViT/DeiT/Swin classifier with the selected observer, quantizes
(int8 weights, uint8 activations, PTF int-LN, LIS log-softmax), and
validates. With an ImageNet-layout directory it reports top-1/top-5; without
data it reports FP-vs-quantized agreement on synthetic inputs (the
quantization-quality signal available without the dataset).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser("samq-test-quant")
    p.add_argument("model", choices=[
        "vit_base", "vit_large", "deit_tiny", "deit_small", "deit_base",
        "swin_tiny", "swin_small", "swin_base",
    ])
    p.add_argument("--quant", action="store_true", default=True)
    p.add_argument("--ptf", action="store_true", default=True)
    p.add_argument("--no-ptf", dest="ptf", action="store_false")
    p.add_argument("--lis", action="store_true", default=True)
    p.add_argument("--no-lis", dest="lis", action="store_false")
    p.add_argument("--quant-method", default="minmax",
                   choices=["minmax", "ema", "omse", "percentile"])
    p.add_argument("--calib-iter", type=int, default=10)
    p.add_argument("--calib-batchsize", type=int, default=8)
    p.add_argument("--val-batches", type=int, default=4)
    p.add_argument("--data", default=None, help="ImageNet val directory")
    p.add_argument("--seed", type=int, default=0)
    from sam_quantization_tpu.cli import add_platform_arg, apply_platform

    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sam_quantization_tpu.quant.fq.pipeline import (
        FQConfig, FQCtx, fq_quantize_weights,
    )

    if args.model.startswith("swin"):
        from sam_quantization_tpu.models import swin_classifier as m

        cfg = m.SWIN_CONFIGS[args.model]
        apply_fn = m.apply
        params = m.init(jax.random.PRNGKey(args.seed), cfg)
    else:
        from sam_quantization_tpu.models import vit_classifier as m

        cfg = m.CLASSIFIER_CONFIGS[args.model]
        apply_fn = m.apply
        params = m.init(jax.random.PRNGKey(args.seed), cfg)

    rng = np.random.default_rng(args.seed)

    def batches(n):
        for _ in range(n):
            yield jnp.asarray(
                rng.normal(size=(args.calib_batchsize, cfg.img_size, cfg.img_size, 3))
                .astype(np.float32)
            )

    fqcfg = FQConfig(
        int_softmax=args.lis, int_norm=args.ptf, observer_a=args.quant_method
    )

    import functools

    @functools.partial(jax.jit, static_argnames=("mode",))
    def calib_step(params, x, state, mode):
        ctx = FQCtx(mode, fqcfg, state)
        apply_fn(params, x, cfg, ctx)
        return {**state, **ctx.updates}, ctx.new_qparams

    calib = list(batches(args.calib_iter))
    state, qp = {}, {}
    for i, x in enumerate(calib):
        mode = "last_calib" if i == len(calib) - 1 else "calib"
        state, qp = calib_step(params, x, state, mode)

    wq = fq_quantize_weights(params, fqcfg)

    fp_fn = jax.jit(lambda x: apply_fn(params, x, cfg))
    q_fn = jax.jit(lambda x: apply_fn(wq, x, cfg, FQCtx("quant", fqcfg, qparams=qp)))

    agree1 = agree5 = total = 0
    for x in batches(args.val_batches):
        fp = np.asarray(fp_fn(x))
        q = np.asarray(q_fn(x))
        top1 = fp.argmax(-1)
        q_rank = np.argsort(-q, axis=-1)
        agree1 += int((q_rank[:, 0] == top1).sum())
        agree5 += int((q_rank[:, :5] == top1[:, None]).any(-1).sum())
        total += len(top1)
    out = {
        "model": args.model,
        "ptf": args.ptf,
        "lis": args.lis,
        "quant_method": args.quant_method,
        "fp_agreement_top1": round(agree1 / total, 4),
        "fp_agreement_top5": round(agree5 / total, 4),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
