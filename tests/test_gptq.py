"""GPTQ solver tests: parity vs the reference torch solver + quality invariants."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import REFERENCE_DIR, requires_reference

from sam_quantization_tpu.quant import gptq
from sam_quantization_tpu.nn import packed
from sam_quantization_tpu.ops import quant_matmul


def _make_problem(rng, N=32, K=64, B=8, T=16):
    w = rng.normal(size=(N, K)).astype(np.float32)
    xs = rng.normal(size=(B, T, K)).astype(np.float32) * 2.0
    # H = (2 / B) Σ_b x_bᵀ x_b  (reference add_batch with tmp=1 per batch,
    # gptq.py:29-60)
    H = np.zeros((K, K), np.float32)
    for b in range(B):
        H += (2.0 / B) * xs[b].T @ xs[b]
    return w, xs, H


@pytest.mark.parametrize("groupsize,actorder,sym", [
    (-1, False, False),
    (32, False, False),
    (-1, True, False),
    (32, True, False),  # regression: g_idx gather under actorder (ADVICE r1)
    (-1, False, True),
])
def test_gptq_beats_rtn_on_hessian_norm(rng, groupsize, actorder, sym):
    w, xs, H = _make_problem(rng)
    res = gptq.gptq_quantize_matrix(
        jnp.asarray(w), jnp.asarray(H),
        bits=4, groupsize=groupsize, actorder=actorder, sym=sym, blocksize=32,
    )
    wq = np.asarray(gptq.reconstruct(res, groupsize, w.shape[1]))

    # RTN baseline at same bits/grouping
    g = groupsize if groupsize > 0 else w.shape[1]
    scale, zero = np.asarray(
        gptq.find_params(jnp.asarray(w), 15, sym)[0]
    ), np.asarray(gptq.find_params(jnp.asarray(w), 15, sym)[1])
    q = np.clip(np.round(w / scale[:, None]) + zero[:, None], 0, 15)
    w_rtn = scale[:, None] * (q - zero[:, None])

    x = xs.reshape(-1, w.shape[1])
    err_gptq = ((x @ (wq - w).T) ** 2).sum()
    err_rtn = ((x @ (w_rtn - w).T) ** 2).sum()
    assert np.isfinite(err_gptq)
    assert err_gptq <= err_rtn * 1.05, (err_gptq, err_rtn)


@requires_reference
@pytest.mark.parametrize(
    "groupsize,actorder", [(-1, False), (32, False), (-1, True), (32, True)]
)
def test_gptq_matches_reference_solver(rng, groupsize, actorder):
    torch = pytest.importorskip("torch")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import importlib

    torch.cuda.synchronize = lambda *a, **k: None  # ref fasterquant calls it
    ref_gptq = importlib.import_module("gptq")

    w, xs, H = _make_problem(rng)
    N, K = w.shape

    layer = torch.nn.Linear(K, N, bias=False)
    with torch.no_grad():
        layer.weight.copy_(torch.tensor(w))
    solver = ref_gptq.GPTQ(layer)
    solver.quantizer = ref_gptq.Quantizer()
    solver.quantizer.configure(4, perchannel=True, sym=False, mse=False)
    for b in range(xs.shape[0]):
        solver.add_batch(torch.tensor(xs[b]), None)
    np.testing.assert_allclose(solver.H.numpy(), H, rtol=1e-4, atol=1e-3)

    scale_t, zero_t = solver.fasterquant(
        blocksize=32, percdamp=0.01,
        groupsize=groupsize if groupsize > 0 else -1, actorder=actorder,
    )
    w_ref = layer.weight.detach().numpy()

    res = gptq.gptq_quantize_matrix(
        jnp.asarray(w), jnp.asarray(H),
        bits=4, groupsize=groupsize, actorder=actorder, blocksize=32,
    )
    w_ours = np.asarray(gptq.reconstruct(res, groupsize, K))
    # Both reconstructions should match the reference's quantized weights
    # almost exactly (same algorithm; fp differences in Cholesky chain).
    mismatch = np.abs(w_ours - w_ref)
    scale_mag = np.abs(w).max()
    assert np.median(mismatch) < 1e-3 * scale_mag
    # Cosine similarity of reconstructions
    cos = (w_ours * w_ref).sum() / (
        np.linalg.norm(w_ours) * np.linalg.norm(w_ref) + 1e-9
    )
    assert cos > 0.999, cos


@pytest.mark.parametrize("bits", [4, 3])
def test_gptq_pack_roundtrip_into_kernel(rng, bits):
    """Solver output → pack → fused matmul pipeline consistency."""
    w, xs, H = _make_problem(rng, N=128, K=128)
    res = gptq.gptq_quantize_matrix(
        jnp.asarray(w), jnp.asarray(H), bits=bits, groupsize=64, blocksize=64
    )
    # our packed layout wants (K, N) int grid with (G, N) scales
    p = packed.pack_int_weights(
        np.asarray(res.q_int).T, np.asarray(res.scales).T, np.asarray(res.zeros).T,
        None, bits=bits, groupsize=64,
    )
    wq_kernel = np.asarray(packed.dequantize(p))
    wq_solver = np.asarray(gptq.reconstruct(res, 64, 128)).T
    np.testing.assert_allclose(wq_kernel, wq_solver, rtol=1e-5, atol=1e-6)

    x = rng.normal(size=(16, 128)).astype(np.float32)
    y = np.asarray(quant_matmul.quant_matmul_xla(jnp.asarray(x), p))
    np.testing.assert_allclose(y, x @ wq_solver, rtol=1e-4, atol=1e-4)


def test_gptq_groupsize_clamps_to_tiny_K(rng):
    """A layer narrower than --groupsize must clamp the group to K (same
    rule as nn/packed.quantize_rtn) instead of crashing the solve/pack —
    vit_tiny's 64-wide layers under the default --groupsize 128
    (round-4 regression: sequential.quantize_linear_gptq + gptq solver)."""
    from sam_quantization_tpu.quant import sequential

    K, N = 64, 192
    lin = {"w": jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))}
    xs = rng.normal(size=(32, K)).astype(np.float32)
    H = jnp.asarray(2.0 * (xs.T @ xs) / len(xs) + np.eye(K, dtype=np.float32))
    qcfg = gptq.GPTQConfig(bits=4, groupsize=128, sym=True)
    out, loss = sequential.quantize_linear_gptq(lin, H, qcfg)
    assert isinstance(out, packed.PackedLinear)
    assert out.groupsize == K  # clamped
    wq = np.asarray(packed.dequantize(out))
    # sane reconstruction: closer to w than an all-zeros "solution"
    err = np.linalg.norm(wq - np.asarray(lin["w"]))
    assert err < 0.5 * np.linalg.norm(np.asarray(lin["w"]))
