"""ViT-L Lp=224 compile/perf probe (VERDICT r4 #5).

The tight Lp=224 padding (12.5% fewer softmax rows) blew Mosaic's 16 MB
scoped-vmem limit at ViT-L's windowed shape (hd=64, nh=16) in round 4 and
was gated off by shape allowlist. This probe attacks the per-program
footprint at that exact shape: head-batch splitting (``hsplit`` — fewer
heads' logits live at once), the sequential per-head form
(SAMQ_PACKED_BATCHED=0), and bw=1, timing every combination that compiles
against the Lp=256 baseline.

Each arm runs in THIS process but the env gates are read at trace time per
(static args) combination, so distinct hsplit/lp values trace fresh kernels;
SAMQ_PACKED_BATCHED is process-global — run with =0 separately.

Run on the TPU:  python tools/vitl_lp_probe.py [--iters 32]
"""

import argparse
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
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--nh", type=int, default=16)
    ap.add_argument("--hd", type=int, default=64)
    ap.add_argument("--nw", type=int, default=25)
    ap.add_argument("--ws", type=int, default=14)
    args = ap.parse_args()

    from sam_quantization_tpu.ops import flash_attention as fa

    NW, ws, nh, hd = args.nw, args.ws, args.nh, args.hd
    L = ws * ws
    CH = nh * hd
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (NW, L, 3 * CH), jnp.bfloat16)
    rel = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (NW, nh, L, 2 * ws), jnp.bfloat16
    )
    scale = hd ** -0.5

    def run_arm(lp, hsplit, bw):
        os.environ["SAMQ_PACKED_LP"] = str(lp)

        @jax.jit
        def step(qkv):
            def body(x, _):
                o = fa.flash_attention_qkv_packed(
                    x, rel, scale, nh=nh, hd=hd, kh=ws, kw=ws,
                    bw_override=bw, hsplit_override=hsplit,
                )
                nxt = jnp.concatenate([o, o, o], axis=-1) * jnp.bfloat16(0.5) \
                    + x * jnp.bfloat16(0.5)
                return nxt.astype(x.dtype), None

            x, _ = jax.lax.scan(body, qkv, None, length=args.iters)
            return jnp.mean(x.astype(jnp.float32))

        try:
            r = step(qkv)
            np.asarray(r)
        except Exception as e:
            msg = str(e).split("\n")[0][:110]
            return None, msg
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(step(qkv))
            times.append(time.perf_counter() - t0)
        return min(times) / args.iters * 1e3, None

    batched = os.environ.get("SAMQ_PACKED_BATCHED", "1")
    print(f"shape NW={NW} L={L} nh={nh} hd={hd} batched={batched}")
    bws = tuple(int(v) for v in os.environ.get("PROBE_BW", "1").split(","))
    hsplits = tuple(
        int(v) for v in os.environ.get("PROBE_HS", "1,2,4,8").split(",")
    )
    results = {}
    for lp in (128, 32):
        for hsplit in hsplits:
            for bw in bws:
                ms, err = run_arm(lp, hsplit, bw)
                tag = f"lp{lp}_hs{hsplit}_bw{bw}"
                if ms is None:
                    print(f"  {tag}: COMPILE-FAIL  {err}")
                else:
                    lpad = 224 if lp == 32 else 256
                    print(f"  {tag} (Lp={lpad}): {ms:.3f} ms/call")
                    results[tag] = ms
    os.environ.pop("SAMQ_PACKED_LP", None)
    if results:
        best = min(results, key=results.get)
        print(f"best: {best} = {results[best]:.3f} ms")


if __name__ == "__main__":
    main()
