"""Run the on-device block-size autotuner and persist the table.

Usage: python tools/autotune.py [--model vit_h] [--m 4096] [--bits 4]
Writes .samq_autotune.json at the repo root; pick_blocks consults it.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_h")
    ap.add_argument("--m", type=int, nargs="+", default=[4096],
                    help="M values to tune (ViT-H runs 4900 windowed-padded "
                         "and 4096 global)")
    ap.add_argument("--bits", type=int, nargs="+", default=[4])
    ap.add_argument("--groupsize", type=int, default=128)
    args = ap.parse_args()
    from sam_quantization_tpu.ops import autotune

    for m in args.m:
        for bits in args.bits:
            table = autotune.tune_model_shapes(
                args.model, M=m, bits=bits, groupsize=args.groupsize
            )
    print(f"saved {len(table)} entries")


if __name__ == "__main__":
    main()
