"""Synthetic segmentation samples for tests and benchmarks.

The reference calibrates/evaluates on SBD (data/datasets/sbd.py); datasets
aren't shipped with either repo, so tests and standalone benchmarks use
seeded random blob scenes with exactly the (image, instance-mask) contract of
the SBD loaders.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


def random_blob_mask(rng: np.random.Generator, size: int, n_ellipses: int = 3):
    """Union of random ellipses — a plausibly-shaped object mask."""
    yy, xx = np.mgrid[0:size, 0:size]
    mask = np.zeros((size, size), bool)
    cx0, cy0 = rng.uniform(0.3 * size, 0.7 * size, 2)
    for _ in range(n_ellipses):
        cx = cx0 + rng.uniform(-0.12, 0.12) * size
        cy = cy0 + rng.uniform(-0.12, 0.12) * size
        a = rng.uniform(0.08, 0.22) * size
        b = rng.uniform(0.08, 0.22) * size
        th = rng.uniform(0, np.pi)
        x, y = xx - cx, yy - cy
        xr = x * np.cos(th) + y * np.sin(th)
        yr = -x * np.sin(th) + y * np.cos(th)
        mask |= (xr / a) ** 2 + (yr / b) ** 2 <= 1.0
    return mask


def synthetic_samples(
    n: int, size: int = 1024, seed: int = 0
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (image (1, size, size, 3) float32 RGB [0,255], gt mask (size, size))."""
    rng = np.random.default_rng(seed)
    for _ in range(n):
        mask = random_blob_mask(rng, size)
        bg = rng.uniform(40, 200, size=3)
        fg = rng.uniform(40, 200, size=3)
        img = np.empty((size, size, 3), np.float32)
        img[:] = bg
        img[mask] = fg
        img += rng.normal(0, 12, img.shape)
        img = np.clip(img, 0, 255).astype(np.float32)
        yield img[None], mask.astype(np.int32)
