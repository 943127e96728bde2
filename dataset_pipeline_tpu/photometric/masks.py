"""Observation/evaluation mask handling.

Counterpart of the reference's mask conventions (``opt/image.h:43-47``,
``opt/image.cc:133-201``): mask images live in
``<dataset>/masks_for_images/<image_folder>/<image>.png`` (per image) and
``<dataset>/masks_for_cameras/<image_folder>.png`` (per camera); pixel values
are bitflags — kObs=1 masks observations, kEvalObs=2 additionally masks
evaluation. Pyramids use bitwise-OR (max) pooling so a masked full-res pixel
masks every coarser pixel containing it.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

import jax.numpy as jnp

MASK_NONE = 0
MASK_OBS = 1
MASK_EVAL_OBS = 2


def image_mask_path(image_base_path: str, image_name: str) -> str:
    folder = os.path.dirname(image_name)
    fname = os.path.splitext(os.path.basename(image_name))[0] + ".png"
    return os.path.join(image_base_path, "masks_for_images", folder, fname)


def camera_mask_path(image_base_path: str, image_name: str) -> str:
    folder = os.path.dirname(image_name)
    return os.path.join(image_base_path, "masks_for_cameras", folder + ".png")


def load_mask(path: str) -> Optional[np.ndarray]:
    if not os.path.exists(path):
        return None
    from PIL import Image

    return np.asarray(Image.open(path)).astype(np.uint8)


def combined_mask(image_base_path: str, image_name: str,
                  shape) -> Optional[np.ndarray]:
    """Bitwise-OR of the image mask and its camera mask, or None."""
    m1 = load_mask(image_mask_path(image_base_path, image_name))
    m2 = load_mask(camera_mask_path(image_base_path, image_name))
    if m1 is None and m2 is None:
        return None
    out = np.zeros(shape, np.uint8)
    for m in (m1, m2):
        if m is not None:
            if m.ndim == 3:
                m = m.max(-1)
            if m.shape != tuple(shape):
                raise ValueError(f"mask shape {m.shape} != image shape {shape}")
            out |= m.astype(np.uint8)
    return out


def save_mask(path: str, mask: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    from PIL import Image

    Image.fromarray(np.asarray(mask, np.uint8)).save(path)


def fill_polygon(shape, polygon_px) -> np.ndarray:
    """Even-odd-rule polygon fill over pixel centers -> bool (H,W)."""
    h, w = shape
    poly = np.asarray(polygon_px, np.float64)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    inside = np.zeros((h, w), bool)
    n = len(poly)
    j = n - 1
    for i in range(n):
        xi, yi = poly[i]
        xj, yj = poly[j]
        cross = (yi > ys) != (yj > ys)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (xj - xi) * (ys - yi) / (yj - yi + 1e-30) + xi
        inside ^= cross & (xs < xint)
        j = i
    return inside


def draw_mask_polygons(shape, polygons, existing: Optional[np.ndarray] = None
                       ) -> np.ndarray:
    """Headless mask drawing (the GUI's ``draw_mask_tool.cc``): rasterize
    ``(polygon_px, flag)`` pairs (flag = MASK_OBS green / MASK_EVAL_OBS red)
    into a uint8 mask, later polygons painting over earlier ones."""
    mask = (np.zeros(shape, np.uint8) if existing is None
            else np.asarray(existing, np.uint8).copy())
    for polygon_px, flag in polygons:
        mask[fill_polygon(shape, polygon_px)] = np.uint8(flag)
    return mask


def build_mask_pyramid(masks: np.ndarray, scale_count: int) -> List[jnp.ndarray]:
    """(B,H,W) uint8 -> per-scale (B,H_s,W_s) via OR (max) pooling
    (``opt/image.cc:133-154``)."""
    m = jnp.asarray(masks, jnp.uint8)
    pyr = [m]
    for _ in range(1, scale_count):
        b, h, w = pyr[-1].shape
        h2, w2 = h // 2, w // 2
        c = pyr[-1][:, : h2 * 2, : w2 * 2]
        pyr.append(c.reshape(b, h2, 2, w2, 2).max((2, 4)))
    return pyr
