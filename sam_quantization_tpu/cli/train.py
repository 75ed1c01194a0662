"""Fine-tuning CLI — the train_sm.py counterpart, mesh-parallel.

Interactive click training on SBD (or synthetic data), dp×tp mesh with
gradient all-reduce via shardings (vs the reference's mp.spawn + NCCL DDP,
train_sm.py:583-641), checkpoint save/resume, scalar logging.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser("samq-train")
    p.add_argument("model", choices=["vit_b", "vit_l", "vit_h", "vit_tiny"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--exp-dir", default="runs")
    p.add_argument("--exp-name", default="finetune")
    p.add_argument("--resume", default=None, help="experiment prefix to resume")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps-per-epoch", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--num-clicks", type=int, default=11)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--sbd-dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    from sam_quantization_tpu.cli import add_platform_arg, apply_platform

    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sam_quantization_tpu.data.synthetic import synthetic_samples
    from sam_quantization_tpu.models import build_sam
    from sam_quantization_tpu.parallel import mesh as mesh_lib
    from sam_quantization_tpu.train import checkpoint, trainer
    from sam_quantization_tpu.utils import experiment

    exp_dir = experiment.init_experiment(args.exp_dir, args.exp_name, args.resume)
    logger = experiment.setup_logger(str(exp_dir / "logs"))
    writer = experiment.ScalarWriterAvg(str(exp_dir / "logs"))

    model = build_sam.sam_model_registry[args.model](checkpoint=args.checkpoint)
    mesh = mesh_lib.make_mesh(tp=args.tp)
    specs = mesh_lib.sam_param_specs(model)
    model = mesh_lib.shard_params(model, mesh, specs)

    tcfg = trainer.TrainConfig(learning_rate=args.lr, num_clicks=args.num_clicks)
    optimizer = trainer.make_optimizer(tcfg)
    opt_state = optimizer.init(model)
    start_epoch = 0
    if args.resume:
        model, opt_state, start_epoch = checkpoint.load_checkpoint(
            str(exp_dir / "checkpoints"), model, opt_state
        )
        logger.info(f"resumed at epoch {start_epoch}")

    step_fn = jax.jit(trainer.make_train_step(tcfg, optimizer), donate_argnums=(0, 1))
    size = model.config.image_encoder.img_size
    dp_shard = NamedSharding(mesh, P("dp"))
    key = jax.random.PRNGKey(args.seed)

    def batches(epoch):
        gen = synthetic_samples(
            args.steps_per_epoch * args.batch_size, size, args.seed + epoch
        )
        for _ in range(args.steps_per_epoch):
            imgs, gts = [], []
            for _ in range(args.batch_size):
                im, gt = next(gen)
                imgs.append(im[0])
                gts.append(gt)
            yield (
                jax.device_put(jnp.asarray(np.stack(imgs)), dp_shard),
                jax.device_put(jnp.asarray(np.stack(gts), jnp.float32), dp_shard),
            )

    gstep = start_epoch * args.steps_per_epoch
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        for images, gts in batches(epoch):
            key, k = jax.random.split(key)
            model, opt_state, aux = step_fn(model, opt_state, images, gts, k)
            gstep += 1
            writer.add_scalar("loss", float(aux["loss"]), gstep)
            writer.add_scalar("iou", float(aux["iou"]), gstep)
        logger.info(
            f"epoch {epoch}: loss={float(aux['loss']):.4f} "
            f"iou={float(aux['iou']):.4f} ({time.time() - t0:.1f}s)"
        )
        checkpoint.save_checkpoint(
            str(exp_dir / "checkpoints"), model, opt_state, epoch + 1
        )
    writer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
