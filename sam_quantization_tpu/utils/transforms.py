"""Image/coordinate resizing to the model's input frame.

Counterpart of ``segment_anything/utils/transforms.py`` (ResizeLongestSide):
numpy-based image resize (bilinear via jax.image on host arrays) plus
coordinate/box rescaling.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ResizeLongestSide:
    """Resize images/coords so the longest side equals ``target_length``
    (ref transforms.py:16-102)."""

    def __init__(self, target_length: int):
        self.target_length = target_length

    @staticmethod
    def get_preprocess_shape(h: int, w: int, long_side: int) -> Tuple[int, int]:
        scale = long_side * 1.0 / max(h, w)
        newh, neww = h * scale, w * scale
        return int(newh + 0.5), int(neww + 0.5)

    def apply_image(self, image: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 → resized (h', w', 3) float32.

        Downscales are antialiased to match the reference's torchvision/PIL
        resize (ref transforms.py:30-38); plain bilinear would alias and skew
        cross-implementation quality comparisons.
        """
        h, w = image.shape[:2]
        newh, neww = self.get_preprocess_shape(h, w, self.target_length)
        out = jax.image.resize(
            jnp.asarray(image, jnp.float32), (newh, neww, image.shape[2]),
            "bilinear", antialias=(newh < h or neww < w),
        )
        return np.asarray(out)

    def apply_coords(self, coords: np.ndarray, original_size) -> np.ndarray:
        old_h, old_w = original_size
        new_h, new_w = self.get_preprocess_shape(old_h, old_w, self.target_length)
        coords = np.array(coords, dtype=np.float32)
        coords = coords.copy()
        coords[..., 0] = coords[..., 0] * (new_w / old_w)
        coords[..., 1] = coords[..., 1] * (new_h / old_h)
        return coords

    def apply_boxes(self, boxes: np.ndarray, original_size) -> np.ndarray:
        boxes = self.apply_coords(boxes.reshape(-1, 2, 2), original_size)
        return boxes.reshape(-1, 4)
