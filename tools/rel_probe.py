"""Find a faster lowering for the windowed rel-pos tile einsums.

tools/attn_stage_probe.py (round 4) measured the two tile einsums in
models/image_encoder._packed_rel_and_flash at 0.132 ms/block on v5e —
350 MFLOP at an effective 2.7 TFLOP/s, i.e. the cost is XLA's lowering
(batch-dim transposes of the 10 MB qg activation + the N=14-lane dots +
the concat into kernel layout), not arithmetic. 28 windowed blocks pay
~3.7 ms/img for it. This probe times alternative formulations that all
produce the kernel's (NW, nh, L, kh+kw) rel layout bit-identically.

Run: python tools/rel_probe.py [--model vit_h] [--iters 256]
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


def timed_carry(f, x, iters, outer=4):
    @jax.jit
    def run(x):
        def body(x, _):
            y = f(x)
            return (y * jnp.bfloat16(0.9) + x * jnp.bfloat16(0.1)).astype(
                x.dtype
            ), None

        x, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.mean(x)

    np.asarray(run(x))
    times = []
    for _ in range(outer):
        t0 = time.perf_counter()
        np.asarray(run(x))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_h")
    ap.add_argument("--iters", type=int, default=256)
    args = ap.parse_args()

    from sam_quantization_tpu.models import image_encoder as ie
    from sam_quantization_tpu.models.configs import CONFIGS

    ecfg = CONFIGS[args.model].image_encoder
    C, ws, G = ecfg.embed_dim, ecfg.window_size, ecfg.grid_size
    nh, hd = ecfg.num_heads, ecfg.head_dim
    NW = ((G + ws - 1) // ws) ** 2
    L = ws * ws
    kh = kw = ws

    key = jax.random.PRNGKey(0)
    Rh = jax.random.normal(key, (kh, kh, hd), jnp.bfloat16) * 0.05
    Rw = jax.random.normal(key, (kw, kw, hd), jnp.bfloat16) * 0.05
    xq = jax.random.normal(jax.random.PRNGKey(1), (NW, L, nh * hd),
                           jnp.bfloat16)

    def out_mix(rel, x):
        # (NW, nh, L, kh+kw) -> carry shape, keeping every element live
        r = jnp.sum(rel, axis=(1, 3))  # (NW, L)
        return x + r[:, :, None].astype(x.dtype) * jnp.bfloat16(1e-3)

    def a_current(x):
        qg = x.reshape(NW, kh, kw, nh, hd)
        rel_h = jnp.einsum("bhwnc,hkc->bnhwk", qg, Rh)
        rel_w = jnp.einsum("bhwnc,wkc->bnhwk", qg, Rw)
        rel = jnp.concatenate([rel_h, rel_w], -1).reshape(NW, nh, L, kh + kw)
        return out_mix(rel, x)

    def b_rowmajor(x):
        # outputs stay (b, h, w, n, k) — no n-before-L transpose inside the
        # einsum; one explicit transpose at the end
        qg = x.reshape(NW, kh, kw, nh, hd)
        rel_h = jnp.einsum("bhwnc,hkc->bhwnk", qg, Rh)
        rel_w = jnp.einsum("bhwnc,wkc->bhwnk", qg, Rw)
        rel = jnp.concatenate([rel_h, rel_w], -1)  # (NW, kh, kw, nh, 2ws)
        rel = rel.reshape(NW, L, nh, kh + kw).transpose(0, 2, 1, 3)
        return out_mix(rel, x)

    def c_unrolled(x):
        # 14+14 explicit small dots on contiguous slices, no einsum batching
        qg = x.reshape(NW, kh, kw, nh, hd)
        hs = []
        for h in range(kh):
            # (NW, kw, nh, hd) @ (hd, kh) -> (NW, kw, nh, kh)
            hs.append(jnp.dot(qg[:, h], Rh[h].T))
        rel_h = jnp.stack(hs, axis=1)  # (NW, kh, kw, nh, kh)
        wsl = []
        for w in range(kw):
            wsl.append(jnp.dot(qg[:, :, w], Rw[w].T))
        rel_w = jnp.stack(wsl, axis=2)  # (NW, kh, kw, nh, kw)
        rel = jnp.concatenate([rel_h, rel_w], -1)
        rel = rel.reshape(NW, L, nh, kh + kw).transpose(0, 2, 1, 3)
        return out_mix(rel, x)

    def d_bigdot(x):
        # ONE clean matmul against the full (hd, kh*kh + kw*kw) tile bank,
        # then a static row-block gather: rows with q-index h keep columns
        # [h*kh, (h+1)*kh) of the h-bank (same for w). N = 392 lanes, no
        # batch dims, no input transpose (contraction on the minor axis).
        Rh2 = Rh.reshape(kh * kh, hd).T  # (hd, kh*kh)
        Rw2 = Rw.reshape(kw * kw, hd).T
        Rall = jnp.concatenate([Rh2, Rw2], axis=1)  # (hd, kh^2+kw^2)
        qg = x.reshape(NW, L, nh, hd)
        full = jnp.einsum("blnc,ck->blnk", qg, Rall)  # (NW, L, nh, 392)
        fh = full[..., : kh * kh].reshape(NW, kh, kw, nh, kh, kh)
        fw = full[..., kh * kh :].reshape(NW, kh, kw, nh, kw, kw)
        ih = jnp.arange(kh)
        # rows (h, w) select h-bank h and w-bank w: diagonal over (h, bank)
        rel_h = fh[:, ih, :, :, ih]  # (kh, NW, kw, nh, kh)
        iw = jnp.arange(kw)
        rel_w = fw[:, :, iw, :, iw]  # (kw, NW, kh, nh, kw)
        rel_h = jnp.moveaxis(rel_h, 0, 1)  # (NW, kh, kw, nh, kh)
        rel_w = jnp.moveaxis(rel_w, 0, 2)  # (NW, kh, kw, nh, kw)
        rel = jnp.concatenate([rel_h, rel_w], -1)
        rel = rel.reshape(NW, L, nh, kh + kw).transpose(0, 2, 1, 3)
        return out_mix(rel, x)

    t0 = timed_carry(lambda x: x * jnp.bfloat16(1.01), xq, args.iters)
    print(f"[rel probe] NW={NW} L={L} nh={nh} hd={hd} kh=kw={ws}")
    print(f"  scan floor            {1e3 * t0:7.3f} ms", flush=True)

    # numerics cross-check on CPU-transferred values first
    ra = jax.jit(a_current)(xq)
    for name, f in [("b_rowmajor", b_rowmajor), ("c_unrolled", c_unrolled),
                    ("d_bigdot", d_bigdot)]:
        rb = jax.jit(f)(xq)
        err = float(jnp.max(jnp.abs(ra.astype(jnp.float32)
                                    - rb.astype(jnp.float32))))
        assert err < 5e-2, (name, err)  # bf16 reassociation: a few ulps

    for name, f in [("a_current", a_current), ("b_rowmajor", b_rowmajor),
                    ("c_unrolled", c_unrolled), ("d_bigdot", d_bigdot)]:
        t = timed_carry(f, xq, args.iters)
        print(f"  {name:20s} {1e3 * (t - t0):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
