"""Train a small SAM on synthetic blob scenes until it actually segments.

The quality gate (5-click mIoU / NoC, ref script/evaluation2.py:225-334) is
meaningless on random weights; no public SAM checkpoint ships in this image.
This driver fits ``vit_tiny`` on seeded synthetic scenes (data/synthetic.py)
with the click-loop trainer (train/trainer.py) until the held-out 5-click
IoU clears a target, then commits a checkpoint for the quantization-quality
table (FP vs GPTQ-INT4 vs RTN-INT4 vs FQ-INT8 deltas).

Run from the repo root:
    python tools/train_synthetic.py --platform cpu --steps 3000 \
        --out checkpoints/vit_tiny_synth
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser("train-synthetic")
    p.add_argument("--model", default="vit_tiny")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--num-clicks", type=int, default=5)
    p.add_argument("--eval-every", type=int, default=200)
    p.add_argument("--eval-samples", type=int, default=16)
    p.add_argument("--target-iou", type=float, default=0.8)
    p.add_argument("--out", default="checkpoints/vit_tiny_synth")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--resume", action="store_true")
    p.add_argument("--pool", type=int, default=512,
                   help="training-scene pool size (bigger = less memorization)")
    p.add_argument("--scenes", default="easy", choices=["easy", "hard"],
                   help="synthetic scene style (data/synthetic.py): 'hard' = "
                        "multi-object distractor scenes that do NOT saturate "
                        "the click metrics, for a discriminating quality table")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    from sam_quantization_tpu.cli import apply_platform

    # shared helper: handles remote-TPU plugins whose platform name is not
    # 'tpu' (cli/__init__.apply_platform)
    apply_platform(args)
    import jax.numpy as jnp
    import numpy as np

    from sam_quantization_tpu.data.synthetic import synthetic_samples
    from sam_quantization_tpu.evaluation import click_eval
    from sam_quantization_tpu.models import sam as sam_lib
    from sam_quantization_tpu.models.configs import CONFIGS
    from sam_quantization_tpu.train import checkpoint as ckpt_lib
    from sam_quantization_tpu.train import trainer

    cfg = CONFIGS[args.model]
    size = cfg.image_encoder.img_size
    model = sam_lib.init(jax.random.PRNGKey(args.seed), cfg)

    tcfg = trainer.TrainConfig(learning_rate=args.lr, num_clicks=args.num_clicks)
    opt = trainer.make_optimizer(tcfg)
    opt_state = opt.init(model)
    step_fn = jax.jit(trainer.make_train_step(tcfg, opt))

    start = 0
    if args.resume and os.path.exists(os.path.join(args.out, "sam_model_latest.npz")):
        model, opt_state, start = ckpt_lib.load_checkpoint(
            args.out, model, opt_state, "latest"
        )
        print(f"resumed at step {start}")

    # data: a fixed pool of training scenes (seeded), held-out eval scenes
    # from a disjoint seed
    pool = [
        (img[0], gt) for img, gt in synthetic_samples(args.pool, size, seed=args.seed + 1, style=args.scenes)
    ]
    eval_samples = [
        (img, gt)
        for img, gt in synthetic_samples(args.eval_samples, size, seed=9999, style=args.scenes)
    ]
    rng = np.random.default_rng(args.seed + 2)

    # model passed as an argument so eval jits compile once, not per call
    @jax.jit
    def _encode(model, x):
        return sam_lib.encode_image(
            model, sam_lib.preprocess(model, x), attn_impl="xla"
        )

    @jax.jit
    def _decode(model, emb, coords, labels, mask_input, mask_valid):
        low_res, iou = sam_lib.decode_masks(
            model, emb, points=(coords, labels), mask_inputs=mask_input,
            mask_valid=mask_valid, multimask_output=False,
        )
        B, N = low_res.shape[:2]
        masks = jax.image.resize(low_res, (B, N, size, size), method="bilinear")
        return masks, low_res, iou

    def eval_iou(model):
        return click_eval.click_loop_eval(
            lambda x: _encode(model, x),
            lambda *a: _decode(model, *a),
            eval_samples, num_clicks=5, img_size=size, seed=123,
        )

    key = jax.random.PRNGKey(args.seed + 3)
    best = 0.0
    t0 = time.time()
    for step in range(start, args.steps):
        idx = rng.integers(0, len(pool), size=args.batch)
        images = jnp.asarray(np.stack([pool[i][0] for i in idx]))
        gts = jnp.asarray(np.stack([pool[i][1] for i in idx]).astype(np.float32))
        key, k2 = jax.random.split(key)
        model, opt_state, aux = step_fn(model, opt_state, images, gts, k2)
        if step % 50 == 0:
            print(
                f"step {step}: loss={float(aux['loss']):.4f} "
                f"train_iou={float(aux['iou']):.3f} "
                f"({(time.time() - t0):.0f}s)",
                flush=True,
            )
        if (step + 1) % args.eval_every == 0 or step == args.steps - 1:
            res = eval_iou(model)
            print(
                f"eval@{step + 1}: click1={res.click1:.3f} click5={res.final:.3f}",
                flush=True,
            )
            ckpt_lib.save_checkpoint(
                args.out, model, opt_state, step + 1, "latest",
                extras={"click1": res.click1, "click5": res.final},
            )
            if res.final > best:
                best = res.final
                ckpt_lib.save_checkpoint(
                    args.out, model, opt_state, step + 1, "best",
                    extras={"click1": res.click1, "click5": res.final},
                )
            if res.final >= args.target_iou:
                print(json.dumps({"status": "target_reached", "step": step + 1,
                                  "click5": res.final}))
                return 0
    print(json.dumps({"status": "done", "best_click5": best}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
