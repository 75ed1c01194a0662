"""Cross-validate the click-loop quality harness against the reference's own.

Every quality number in QUALITY.json comes from this repo's reimplementation
of the reference's 5-click loop (evaluation/click_eval.py, ref
script/evaluation2.py:225-334) scoring this repo's own models — a closed
loop. This tool breaks the circle:

  1. load the committed vit_tiny checkpoint (JAX),
  2. run OUR harness on held-out synthetic scenes, recording the click
     sequences it used,
  3. export the checkpoint through models.build_sam.to_torch_state_dict and
     rebuild it under the REFERENCE'S torch modules (/root/reference,
     imported as an external oracle — tools/torch_harness.py),
  4. replay the identical clicks through the reference's loop semantics,
  5. report per-click mean IoU from both harnesses and the max gap.

Agreement (≲1e-3 mIoU) means the JAX model, the exported weights, and the
evaluation semantics all match the reference stack end-to-end; QUALITY.json
stops being self-referential.

    python tools/cross_validate_harness.py --samples 16 --out CROSSVAL.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    ap = argparse.ArgumentParser("cross-validate-harness")
    ap.add_argument("--ckpt", default="checkpoints/vit_tiny_synth")
    ap.add_argument("--model", default="vit_tiny")
    ap.add_argument("--name", default="best")
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--num-clicks", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sam_quantization_tpu.data.synthetic import synthetic_samples
    from sam_quantization_tpu.evaluation import click_eval
    from sam_quantization_tpu.models import build_sam, sam as sam_lib
    from sam_quantization_tpu.models.configs import CONFIGS
    from sam_quantization_tpu.train import checkpoint as ckpt_lib
    from sam_quantization_tpu.train import trainer

    import torch_harness

    cfg = CONFIGS[args.model]
    size = cfg.image_encoder.img_size
    template = sam_lib.init(jax.random.PRNGKey(0), cfg)
    opt_t = trainer.make_optimizer(trainer.TrainConfig()).init(template)
    model, _, step = ckpt_lib.load_checkpoint(args.ckpt, template, opt_t, args.name)
    model = jax.tree_util.tree_map(jnp.asarray, model)
    print(f"loaded {args.ckpt}/{args.name} (step {step})")

    # same held-out seed AND the same preprocess seam as QUALITY.json
    # (tools/quality_table.py: encode = preprocess -> encoder); images are
    # normalized ONCE in numpy and the identical tensor feeds both stacks
    # (the torch Sam.preprocess is the same (x - mean)/std, ref sam.py:160-174)
    mean = np.asarray(cfg.pixel_mean, np.float32)
    std = np.asarray(cfg.pixel_std, np.float32)
    samples = [
        (((img - mean) / std).astype(np.float32), gt)
        for img, gt in synthetic_samples(args.samples, size, seed=9999)
    ]

    encode, decode = click_eval.make_sam_backend(model)
    ours = click_eval.click_loop_eval(
        encode, decode, samples, num_clicks=args.num_clicks,
        img_size=size, seed=123,
    )
    print("ours  (JAX harness):", [f"{v:.4f}" for v in ours.mean_ious])

    sd = build_sam.to_torch_state_dict(model)
    tsam = torch_harness.build_reference_torch_sam(cfg, sd)
    theirs = {}
    for layout in ("slots", "literal"):
        ious = torch_harness.reference_click_loop(
            tsam, samples, ours.clicks, num_clicks=args.num_clicks,
            point_layout=layout,
        )
        theirs[layout] = np.asarray(ious).mean(axis=0)
        print(f"theirs (ref torch, {layout:7s}):",
              [f"{v:.4f}" for v in theirs[layout]])

    gap = float(np.max(np.abs(np.asarray(ours.mean_ious) - theirs["slots"])))
    layout_delta = float(np.max(np.abs(theirs["slots"] - theirs["literal"])))
    print(f"max per-click mean-IoU gap (same clicks, same token layout): {gap:.5f}")
    print(f"slot-padding vs literal point-list delta (torch only): {layout_delta:.5f}")

    result = {
        "checkpoint": f"{args.ckpt}/{args.name}",
        "step": int(step),
        "samples": args.samples,
        "num_clicks": args.num_clicks,
        "jax_mean_ious": [round(float(v), 5) for v in ours.mean_ious],
        "ref_torch_mean_ious": [round(float(v), 5) for v in theirs["slots"]],
        "ref_torch_literal_layout": [round(float(v), 5) for v in theirs["literal"]],
        "max_gap": round(gap, 6),
        "point_layout_delta": round(layout_delta, 6),
        "agree_1e3": bool(gap < 1e-3),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")
    return result


if __name__ == "__main__":
    main()
