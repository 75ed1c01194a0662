"""C++ runtime library vs numpy/scipy reference implementations."""

import numpy as np
import pytest

from sam_quantization_tpu import native
from sam_quantization_tpu.utils import amg


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def test_rle_roundtrip(lib, rng):
    mask = rng.random((37, 53)) > 0.6
    counts = native.rle_encode(mask)
    ref = amg.mask_to_rle(mask)["counts"]
    assert counts == ref
    back = native.rle_decode(counts, 37, 53)
    np.testing.assert_array_equal(back, mask)


def test_nms_matches_numpy(lib, rng):
    n = 200
    boxes = rng.uniform(0, 100, size=(n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, size=(n, 2))
    scores = rng.random(n).astype(np.float32)
    keep_c = native.box_nms(boxes, scores, 0.5)
    keep_np = amg.box_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(np.sort(keep_c), np.sort(keep_np))


def test_edt_matches_scipy(lib, rng):
    from scipy import ndimage

    mask = rng.random((64, 80)) > 0.3
    got = native.distance_transform_edt(mask)
    want = ndimage.distance_transform_edt(mask)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_pack_matches_jnp(lib, rng):
    from sam_quantization_tpu.nn import packed

    K, N, bits = 256, 128, 4
    w = rng.integers(0, 16, size=(K, N)).astype(np.int32)
    pb = packed.default_pack_block(K, bits)
    got = native.pack_block_planar(w, bits, pb)
    ref = packed.pack_int_weights(
        w, np.ones((1, N), np.float32), np.zeros((1, N), np.float32), None, bits, 0
    )
    np.testing.assert_array_equal(got, np.asarray(ref.qweight))


def test_rle_encode_batch_matches_single_and_fallback():
    """Threaded batch RLE (round 4): parity with the single-mask path and
    the numpy fallback, including the small-cap overflow retry (noisy
    masks exceed the 8192-count capacity) and non-0/1 input values."""
    from sam_quantization_tpu.utils import amg

    rng = np.random.RandomState(7)
    blobs = np.zeros((5, 300, 200), np.uint8)
    yy, xx = np.mgrid[:300, :200]
    for i in range(4):
        blobs[i][(yy - 50 * i - 20) ** 2 + (xx - 40 * i - 20) ** 2 < 900] = 255
    blobs[4] = (rng.rand(300, 200) > 0.5) * 7  # overflow-retry path
    got = native.rle_encode_batch(blobs)
    for i, m in enumerate(blobs):
        b = (m != 0).astype(np.uint8)
        assert got[i] == native.rle_encode(b), i
        assert got[i] == amg.mask_to_rle(b)["counts"], i


def test_rle_encode_batch_packed_matches_unpacked():
    """Device-packed column-major bit stream → same RLE as the bool path
    (csrc rle_encode_batch_packed; utils/amg.packbits_masks layout)."""
    import jax
    import jax.numpy as jnp

    from sam_quantization_tpu.utils import amg

    rng = np.random.default_rng(3)
    for h, w in ((64, 48), (100, 37), (8, 8)):
        yy, xx = np.mgrid[:h, :w]
        masks = np.stack([
            ((yy - rng.integers(h)) ** 2 + (xx - rng.integers(w)) ** 2
             < rng.integers(2, max(h, w) // 2) ** 2)
            for _ in range(5)
        ] + [np.zeros((h, w), bool), np.ones((h, w), bool)])
        ref = native.rle_encode_batch(masks.astype(np.uint8))
        packed = np.asarray(amg.packbits_masks(jnp.asarray(masks)))
        assert packed.shape == (len(masks), w, (h + 7) // 8)
        got = native.rle_encode_batch_packed(packed, h, w)
        assert got == ref
        for c, m in zip(got, masks):
            assert (native.rle_decode(c, h, w) == m).all()
