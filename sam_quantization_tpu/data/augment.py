"""Training augmentations (albumentations-counterpart, numpy-only).

The reference composes albumentations transforms (data/transforms.py:13-37
``UniformRandomResize``, plus flips/crops configured in train_sm.py). These
are host-side numpy ops applied before device transfer.
"""

from __future__ import annotations

import random
from typing import List, Sequence, Tuple

import numpy as np


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, image: np.ndarray, mask: np.ndarray):
        for t in self.transforms:
            image, mask = t(image, mask)
        return image, mask


class UniformRandomResize:
    """Scale both image and mask by a uniform random factor
    (ref data/transforms.py:13-37)."""

    def __init__(self, scale_range: Tuple[float, float] = (0.9, 1.1)):
        self.scale_range = scale_range

    def __call__(self, image, mask):
        import jax
        import jax.numpy as jnp

        scale = random.uniform(*self.scale_range)
        h = int(round(image.shape[0] * scale))
        w = int(round(image.shape[1] * scale))
        img = np.asarray(
            jax.image.resize(jnp.asarray(image, jnp.float32), (h, w, image.shape[2]),
                             "bilinear")
        )
        m = np.asarray(
            jax.image.resize(jnp.asarray(mask, jnp.float32), (h, w), "nearest")
        ).astype(mask.dtype)
        return img, m


class HorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, image, mask):
        if random.random() < self.p:
            return image[:, ::-1].copy(), mask[:, ::-1].copy()
        return image, mask


class RandomCrop:
    def __init__(self, size: Tuple[int, int]):
        self.size = size

    def __call__(self, image, mask):
        th, tw = self.size
        h, w = image.shape[:2]
        if h <= th or w <= tw:
            pad_h, pad_w = max(0, th - h), max(0, tw - w)
            image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)))
            mask = np.pad(mask, ((0, pad_h), (0, pad_w)))
            h, w = image.shape[:2]
        y0 = random.randint(0, h - th)
        x0 = random.randint(0, w - tw)
        return image[y0 : y0 + th, x0 : x0 + tw], mask[y0 : y0 + th, x0 : x0 + tw]


class RandomBrightnessContrast:
    def __init__(self, brightness: float = 0.25, contrast: float = 0.25, p=0.75):
        self.brightness, self.contrast, self.p = brightness, contrast, p

    def __call__(self, image, mask):
        if random.random() >= self.p:
            return image, mask
        b = 1.0 + random.uniform(-self.brightness, self.brightness)
        c = 1.0 + random.uniform(-self.contrast, self.contrast)
        mean = image.mean()
        out = np.clip((image - mean) * c + mean * b, 0, 255)
        return out.astype(image.dtype), mask


def default_train_augmentor(crop_size: Tuple[int, int] = (1024, 1024)) -> Compose:
    """The reference trainer's augmentation stack shape (train_sm.py cfg)."""
    return Compose([
        UniformRandomResize((0.75, 1.25)),
        HorizontalFlip(),
        RandomCrop(crop_size),
        RandomBrightnessContrast(),
    ])
