"""Prompt→mask decoder latency/throughput (the reference times this under
its TRT/PPLNN engines: trt_infer.py:206-313, ppl_infer.py:60-152 run the
exported ONNX decoder per click; here the same traceable module —
``export.SamDecoderModule`` — is timed as a jitted XLA program).

Timing is relay-honest: ``reps`` sequential decodes run inside ONE jitted
``lax.scan`` dispatch (distinct point coordinates per step defeat CSE), so
the axon round-trip amortizes to ~0 and ``block_until_ready`` is truthful.

Two figures:
  * single-prompt latency (ms) — the interactive click path
    (demo/server.py, SamPredictor.predict)
  * batched-prompt throughput (prompts/s at B=64 via vmap) — the AMG
    inner loop (automatic_mask_generator.py decodes point grids in batches)

Run: python tools/decoder_bench.py [--model vit_h] [--reps 64] [--pbatch 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_h")
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--pbatch", type=int, default=64)
    ap.add_argument("--outer", type=int, default=4)
    args = ap.parse_args()

    from sam_quantization_tpu import export
    from sam_quantization_tpu.models.build_sam import sam_model_registry

    model = sam_model_registry[args.model]()
    model = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        model,
    )
    dec = export.SamDecoderModule(model)
    ecfg = model.config.image_encoder
    eh = ecfg.img_size // ecfg.patch_size
    emb = jnp.zeros((1, eh, eh, ecfg.out_chans), jnp.bfloat16)
    mask_in = jnp.zeros((1, 4 * eh, 4 * eh, 1), jnp.bfloat16)
    has_mask = jnp.zeros((1,), jnp.bfloat16)
    labels = jnp.asarray([[1.0, -1.0]], jnp.bfloat16)  # 1 click + pad slot

    def decode_one(coords):
        masks, iou, _ = dec(emb, coords, labels, mask_in, has_mask)
        return (jnp.mean(masks) + jnp.mean(iou)).astype(jnp.float32)

    # distinct coords per scan step (CSE defeat); coords stay in-range
    steps = jnp.arange(args.reps, dtype=jnp.bfloat16)
    coords = (
        jnp.asarray([[[500.0, 375.0], [0.0, 0.0]]], jnp.bfloat16)
        + steps[:, None, None, None]
    )  # (reps, 1, 2, 2)

    @jax.jit
    def run_single(coords):
        def body(acc, c):
            return acc + decode_one(c), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), coords)
        return acc

    np.asarray(run_single(coords))
    times = []
    for _ in range(args.outer):
        t0 = time.perf_counter()
        np.asarray(run_single(coords))
        times.append(time.perf_counter() - t0)
    single_ms = min(times) / args.reps * 1e3

    # batched prompts: vmap over the prompt axis, one shared embedding —
    # the AMG grid-decode shape (automatic_mask_generator.py points_per_batch)
    bcoords = (
        jnp.asarray([[[500.0, 375.0], [0.0, 0.0]]], jnp.bfloat16)[None]
        + jnp.arange(args.pbatch, dtype=jnp.bfloat16)[:, None, None, None]
    )  # (P, 1, 2, 2)
    vdec = jax.vmap(decode_one)

    @jax.jit
    def run_batched(bc):
        def body(acc, _):
            step = jnp.sum(vdec(bc + acc.astype(jnp.bfloat16) * jnp.bfloat16(1e-6)))
            return acc + step.astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=args.reps)
        return acc

    np.asarray(run_batched(bcoords))
    times = []
    for _ in range(args.outer):
        t0 = time.perf_counter()
        np.asarray(run_batched(bcoords))
        times.append(time.perf_counter() - t0)
    batched_prompts_s = args.pbatch * args.reps / min(times)

    print(
        json.dumps(
            {
                "model": args.model,
                "single_prompt_ms": round(single_ms, 3),
                "batched_prompts_per_s": round(batched_prompts_s, 1),
                "pbatch": args.pbatch,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
