"""Soft-mask preprocessing.

Capability of the reference's `process_mask` (captured_data.py:12-20): signed
distance transform of the binary silhouette, clipped to a 1-pixel transition
band, mapped to [0,1]; the bottom image row is forced to 0.5 (the object
stands on the turntable there, so silhouette evidence is ambiguous).
Implemented with scipy's exact euclidean distance transform instead of cv2.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def process_mask(M: np.ndarray) -> np.ndarray:
    """M: binary uint8 mask (0/1 or 0/255). Returns float mask in [0,1]."""
    M = np.asarray(M)
    if M.max() == 255:
        M = M // 255
    assert M.max() <= 1
    inside = ndimage.distance_transform_edt(M)
    outside = ndimage.distance_transform_edt(1 - M)
    dist = np.clip(inside, 0, 1) - np.clip(outside - 1, 0, 1)  # [-1, +1]
    mask = (dist + 1.0) / 2.0
    mask[-1] = 0.5
    return mask
