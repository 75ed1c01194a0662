"""Visualization overlays (masks, points, boxes).

Counterpart of the reference's utils/utils.py:5-130 + utils/vis.py matplotlib
helpers. Two tiers: pure-numpy blending (always available, returns arrays)
and matplotlib axis helpers mirroring the reference's show_* API.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def blend_mask(
    image: np.ndarray,
    mask: np.ndarray,
    color=(30, 144, 255),
    alpha: float = 0.6,
) -> np.ndarray:
    """Alpha-blend a binary mask onto an (H, W, 3) uint8 image."""
    out = image.astype(np.float32).copy()
    m = mask.astype(bool)
    out[m] = (1 - alpha) * out[m] + alpha * np.asarray(color, np.float32)
    return out.astype(np.uint8)


def draw_points(
    image: np.ndarray,
    coords: np.ndarray,
    labels: np.ndarray,
    radius: int = 5,
) -> np.ndarray:
    """Draw positive (green) / negative (red) click markers. coords: (N, 2) xy."""
    out = image.copy()
    h, w = image.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w]
    for (x, y), lab in zip(coords, labels):
        if lab < 0:
            continue
        color = (0, 200, 0) if lab >= 1 else (220, 0, 0)
        circ = (yy - y) ** 2 + (xx - x) ** 2 <= radius**2
        out[circ] = color
    return out


def draw_box(image: np.ndarray, box, color=(255, 200, 0), thickness: int = 2):
    out = image.copy()
    x0, y0, x1, y1 = [int(v) for v in box]
    out[y0 : y0 + thickness, x0:x1] = color
    out[y1 - thickness : y1, x0:x1] = color
    out[y0:y1, x0 : x0 + thickness] = color
    out[y0:y1, x1 - thickness : x1] = color
    return out


# -- matplotlib tier (API parity with the reference notebooks) --------------


def show_mask(mask, ax, random_color=False):
    import matplotlib  # noqa: F401

    if random_color:
        color = np.concatenate([np.random.random(3), np.array([0.6])], axis=0)
    else:
        color = np.array([30 / 255, 144 / 255, 255 / 255, 0.6])
    h, w = mask.shape[-2:]
    mask_image = mask.reshape(h, w, 1) * color.reshape(1, 1, -1)
    ax.imshow(mask_image)


def show_points(coords, labels, ax, marker_size=375):
    pos = coords[labels == 1]
    neg = coords[labels == 0]
    ax.scatter(pos[:, 0], pos[:, 1], color="green", marker="*", s=marker_size,
               edgecolor="white", linewidth=1.25)
    ax.scatter(neg[:, 0], neg[:, 1], color="red", marker="*", s=marker_size,
               edgecolor="white", linewidth=1.25)


def show_box(box, ax):
    import matplotlib.patches as patches

    x0, y0 = box[0], box[1]
    w, h = box[2] - box[0], box[3] - box[1]
    ax.add_patch(
        patches.Rectangle((x0, y0), w, h, edgecolor="green", facecolor=(0, 0, 0, 0), lw=2)
    )


def show_anns(anns, ax):
    """AMG annotation overlay (ref notebook helper)."""
    if len(anns) == 0:
        return
    sorted_anns = sorted(anns, key=lambda a: a["area"], reverse=True)
    ax.set_autoscale_on(False)
    for ann in sorted_anns:
        m = ann["segmentation"]
        color_mask = np.concatenate([np.random.random(3), [0.35]])
        img = np.ones((*m.shape, 4))
        img[..., :4] = color_mask
        img[~m] = 0
        ax.imshow(img)
