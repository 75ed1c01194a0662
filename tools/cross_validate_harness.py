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

    # our harness defaults to the reference's LITERAL growing click list
    # (evaluation2.py:278-306) — the layout question from VERDICT r3/r4 is
    # resolved by matching the reference's semantics, and the slots form
    # (one compiled decode program; the serving layout) is quantified below.
    encode, decode = click_eval.make_sam_backend(model)
    ours = click_eval.click_loop_eval(
        encode, decode, samples, num_clicks=args.num_clicks,
        img_size=size, seed=123, record_low_res=True,
    )
    print("ours  (JAX harness, literal):", [f"{v:.4f}" for v in ours.mean_ious])

    sd = build_sam.to_torch_state_dict(model)
    tsam = torch_harness.build_reference_torch_sam(cfg, sd)
    # Fork-behavior pass FIRST (the as-committed reference, including its
    # rel_w broadcast-matmul bug — torch_harness.install_upstream_rel_pos
    # docstring): its delta vs the corrected oracle attributes the residual.
    fork_ious = torch_harness.reference_click_loop(
        tsam, samples, ours.clicks, num_clicks=args.num_clicks,
        point_layout="literal",
    )
    theirs_fork = np.asarray(fork_ious).mean(axis=0)
    print("theirs (fork rel_w bug)     :", [f"{v:.4f}" for v in theirs_fork])
    # Upstream-intent oracle for all remaining passes: the einsum rel_w the
    # fork commented out, which this framework implements.
    uninstall = torch_harness.install_upstream_rel_pos()
    try:
        theirs = {}
        for layout in ("literal", "slots"):
            ious = torch_harness.reference_click_loop(
                tsam, samples, ours.clicks, num_clicks=args.num_clicks,
                point_layout=layout,
            )
            theirs[layout] = np.asarray(ious).mean(axis=0)
            print(f"theirs (ref torch, {layout:7s}):",
                  [f"{v:.4f}" for v in theirs[layout]])
        # Teacher-forced replay (VERDICT r4 #2): feed the torch loop OUR
        # recorded low-res masks at every click, so the two stacks see
        # identical inputs per click and the gap cannot compound through the
        # click cascade. The residual is pure single-forward numeric drift.
        tf_ious, tf_low_res = torch_harness.reference_click_loop(
            tsam, samples, ours.clicks, num_clicks=args.num_clicks,
            point_layout="literal", mask_override=ours.low_res,
            return_low_res=True,
        )
    finally:
        # restore the fork's as-committed rel_w (the patch mutates the
        # shared segment_anything module — a later same-process
        # fork-behavior pass must not silently see upstream semantics)
        uninstall()
    theirs_tf = np.asarray(tf_ious).mean(axis=0)
    print("theirs (teacher-forced)     :", [f"{v:.4f}" for v in theirs_tf])

    # Logit-level agreement: under teacher forcing both stacks compute the
    # same function of identical inputs per click, so any IoU residual must
    # be threshold flips of near-zero logits. Measure it directly.
    logit_diffs, logit_scale, flip_fracs = [], [], []
    for si in range(len(samples)):
        for k in range(args.num_clicks):
            a = np.asarray(ours.low_res[si][k], np.float32).ravel()
            b = np.asarray(tf_low_res[si][k], np.float32).ravel()
            logit_diffs.append(np.max(np.abs(a - b)))
            logit_scale.append(np.max(np.abs(a)))
            flip_fracs.append(np.mean((a > 0) != (b > 0)))
    logit_max_diff = float(np.max(logit_diffs))
    logit_amax = float(np.max(logit_scale))
    flip_frac = float(np.mean(flip_fracs))
    print(
        f"low-res logit agreement (teacher-forced): max|d|={logit_max_diff:.4f} "
        f"(logit scale ±{logit_amax:.1f}), sign-flip fraction={flip_frac:.5f}"
    )

    ours_arr = np.asarray(ours.mean_ious)
    gap = float(np.max(np.abs(ours_arr - theirs["literal"])))
    gap_numeric = float(np.max(np.abs(ours_arr - theirs_tf)))
    fork_gap = float(np.max(np.abs(ours_arr - theirs_fork)))
    layout_delta = float(np.max(np.abs(theirs["slots"] - theirs["literal"])))
    print(f"max per-click mean-IoU gap (upstream-intent oracle): {gap:.5f}")
    print(f"  .. teacher-forced (numeric only, no cascade): {gap_numeric:.5f}")
    print(f"  .. cascade contribution: {max(gap - gap_numeric, 0.0):.5f}")
    print(f"  .. vs as-committed fork (incl. its rel_w matmul bug): {fork_gap:.5f}")
    print(f"slots (serving layout) vs literal delta (torch only): {layout_delta:.5f}")

    result = {
        "checkpoint": f"{args.ckpt}/{args.name}",
        "step": int(step),
        "samples": args.samples,
        "num_clicks": args.num_clicks,
        "point_layout": "literal (reference semantics, the harness default)",
        "jax_mean_ious": [round(float(v), 5) for v in ours.mean_ious],
        "ref_torch_mean_ious": [round(float(v), 5) for v in theirs["literal"]],
        "ref_torch_teacher_forced": [round(float(v), 5) for v in theirs_tf],
        "ref_torch_slots_layout": [round(float(v), 5) for v in theirs["slots"]],
        "max_gap": round(gap, 6),
        "max_gap_teacher_forced_numeric": round(gap_numeric, 6),
        "cascade_gap": round(max(gap - gap_numeric, 0.0), 6),
        "fork_behavior_gap": round(fork_gap, 6),
        "fork_behavior_note": (
            "gap vs the as-committed fork, whose rel_w broadcast-matmul "
            "indexes Rw by h instead of w (image_encoder.py:402-404; "
            "torch_harness.install_upstream_rel_pos docstring). The "
            "framework implements the upstream einsum the fork commented "
            "out; max_gap above is measured against that corrected oracle."
        ),
        "point_layout_delta": round(layout_delta, 6),
        "agree_1e3": bool(gap < 1e-3),
        "numeric_agree_1e3": bool(gap_numeric < 1e-3),
        "logit_max_abs_diff": round(logit_max_diff, 6),
        "logit_abs_max": round(logit_amax, 3),
        "pred_sign_flip_fraction": round(flip_frac, 6),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")
    return result


if __name__ == "__main__":
    main()
