"""Image helpers (capability of reference save_torch / torch2pil,
DiffRender.py:551-559): min-max normalize to uint8, save or convert."""

from __future__ import annotations

import numpy as np


def normalize_to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, dtype=np.float64)
    lo, hi = img.min(), img.max()
    scale = 255.0 / (hi - lo) if hi > lo else 0.0
    return ((img - lo) * scale).astype(np.uint8)


def save_image(path: str, img, resy: int | None = None,
               resx: int | None = None) -> None:
    """Save a flat or 2D array as an image (min-max normalized)."""
    import imageio

    arr = np.asarray(img)
    if arr.ndim == 1 and resy and resx:
        arr = arr.reshape(resy, resx)
    elif arr.ndim == 2 and arr.shape[1] in (1, 3) and resy and resx:
        arr = arr.reshape(resy, resx, -1)
    arr = normalize_to_uint8(arr)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    imageio.imsave(path, arr)


def to_pil(img, resy: int | None = None, resx: int | None = None):
    from PIL import Image

    arr = np.asarray(img)
    if arr.ndim == 1 and resy and resx:
        arr = arr.reshape(resy, resx)
    arr = normalize_to_uint8(arr)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    return Image.fromarray(arr)
