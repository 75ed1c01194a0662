"""Measure — don't derive — the multi-chip collective schedule.

BENCHMARKS.md's scaling section previously argued from byte math (2 psums
per block x 12.5 MB at ViT-H tp=2). This tool compiles the ACTUAL
tensor-parallel encoder forward under GSPMD on the virtual CPU mesh
(``--xla_force_host_platform_device_count``), walks the optimized HLO, and
reports every collective with its shape/bytes — the compiler's real
schedule, not the notebook's. It also times the sharded step against the
single-device one at a small scale as a virtual-mesh sanity ratio (CPU
relative timing only; no pod is attachable in this environment).

    python tools/mesh_collectives.py --model vit_h --tp 2        # HLO audit
    python tools/mesh_collectives.py --model vit_b --tp 2 --time # + timing
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "s64": 8, "f64": 8,
}

COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def parse_collectives(hlo_text: str):
    """[(op, dtype, shape, bytes)] for every collective in optimized HLO."""
    out = []
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r"[%\w.-]+ = (\w+)\[([\d,]*)\][^=]*?(" +
                     "|".join(COLLECTIVES) + r")\(", s)
        if not m:
            continue
        dtype, dims, op = m.group(1), m.group(2), m.group(3)
        shape = tuple(int(d) for d in dims.split(",") if d) if dims else ()
        n = int(np.prod(shape)) if shape else 1
        out.append((op, dtype, shape, n * DTYPE_BYTES.get(dtype, 4)))
    return out


def encoder_tp_hlo(model_name: str, tp: int, batch: int = 1, ndev: int = 0,
                   tp_ctx: bool = True):
    """Compile the scanned encoder forward tp-sharded; return optimized HLO.

    ``ndev`` defaults to ``tp`` (pure tensor-parallel mesh, dp=1) so the
    audit isolates the tp collectives; pass 8 for the dp x tp layout the
    dryrun uses.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sam_quantization_tpu.models import image_encoder as ie
    from sam_quantization_tpu.models.configs import CONFIGS
    from sam_quantization_tpu.parallel import mesh as mesh_lib

    ecfg = CONFIGS[model_name].image_encoder
    mesh = mesh_lib.make_mesh(ndev or tp, tp=tp)
    params = ie.init(jax.random.PRNGKey(0), ecfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    if tp_ctx:
        # tp-major head-interleaved qkv columns: the layout that makes
        # head-aligned N-sharding expressible (parallel.mesh.tp_pack_qkv)
        params = mesh_lib.tp_pack_qkv(params, ecfg.num_heads, tp)
    specs = mesh_lib.encoder_param_specs(params)
    params = mesh_lib.shard_params(params, mesh, specs)
    size = ecfg.img_size
    batch = max(batch, mesh.shape["dp"])  # dp requires divisible batch
    x = jax.device_put(
        jnp.zeros((batch, size, size, 3), jnp.bfloat16),
        NamedSharding(mesh, P("dp")),
    )

    fn = jax.jit(lambda p, xi: ie.apply(p, xi, ecfg, attn_impl="xla"))
    import contextlib

    ctx = mesh_lib.tensor_parallel(mesh) if tp_ctx else contextlib.nullcontext()
    with ctx:
        compiled = fn.lower(params, x).compile()
    (hlo,) = compiled.runtime_executable().hlo_modules()
    return hlo.to_string(), mesh, fn, params, x


def main(argv=None):
    ap = argparse.ArgumentParser("mesh-collectives")
    ap.add_argument("--model", default="vit_h")
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--ndev", type=int, default=0)
    ap.add_argument("--no-tp-ctx", action="store_true",
                    help="audit WITHOUT the tensor_parallel constraint "
                         "context (the pre-fix schedule)")
    ap.add_argument("--time", action="store_true",
                    help="also run + time sharded vs single-device (use a "
                         "small --model; ViT-H on CPU is minutes/step)")
    args = ap.parse_args(argv)

    hlo, mesh, fn, params, x = encoder_tp_hlo(
        args.model, args.tp, args.batch, args.ndev,
        tp_ctx=not args.no_tp_ctx,
    )
    cols = parse_collectives(hlo)
    from sam_quantization_tpu.models.configs import CONFIGS

    ecfg = CONFIGS[args.model].image_encoder
    print(f"{args.model} encoder forward, mesh dp={mesh.shape['dp']} "
          f"tp={mesh.shape['tp']}, batch={args.batch}")
    by_kind = collections.Counter()
    bytes_by_kind = collections.Counter()
    for op, dtype, shape, nbytes in cols:
        by_kind[op] += 1
        bytes_by_kind[op] += nbytes
    if not cols:
        print("  no collectives in optimized HLO")
    for op in by_kind:
        print(f"  {op:20s} x{by_kind[op]:3d}  total {bytes_by_kind[op] / 1e6:8.2f} MB")
    # the scan body executes n_super times per forward: report per-image
    # totals by multiplying scanned-body collectives out is unnecessary —
    # the HLO of the scan body appears once; count dynamic trip multipliers
    period = None
    g = sorted(ecfg.global_attn_indexes)
    if g and ecfg.depth % len(g) == 0:
        period = ecfg.depth // len(g)
    print("  (collectives inside the scanned super-block body execute "
          f"n_super={ecfg.depth // period if period else '?'} times per image;"
          " windowed-slot ones additionally x(period-1))")
    for op, dtype, shape, nbytes in cols:
        print(f"    {op:18s} {dtype}{list(shape)}  {nbytes / 1e6:.2f} MB")

    if args.time:
        import time

        def bench(f, *a):
            r = f(*a)
            jax.block_until_ready(r)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f(*a))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        from sam_quantization_tpu.parallel import mesh as mesh_lib

        with (mesh_lib.tensor_parallel(mesh) if not args.no_tp_ctx
              else __import__('contextlib').nullcontext()):
            t_tp = bench(fn, params, x)
        # single-device baseline: same program, 1-device mesh
        from sam_quantization_tpu.models import image_encoder as ie

        p1 = jax.device_put(
            jax.tree_util.tree_map(np.asarray, params), jax.devices("cpu")[0]
        )
        x1 = jax.device_put(np.asarray(x), jax.devices("cpu")[0])
        f1 = jax.jit(lambda p, xi: ie.apply(p, xi, ecfg, attn_impl="xla"))
        t_1 = bench(f1, p1, x1)
        print(f"  virtual-mesh step {t_tp * 1e3:.1f} ms vs single-device "
              f"{t_1 * 1e3:.1f} ms (CPU sanity ratio {t_1 / t_tp:.2f}x; "
              "host cores emulate devices — NOT a chip-scaling claim)")


if __name__ == "__main__":
    main()
