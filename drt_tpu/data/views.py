"""View data containers and view-index generators.

Capability of the reference's `Data` base class (captured_data.py:43-82):
per-view tensors + two infinite shuffled view-index generators. TPU redesign:
all 72 views are stacked into device arrays once (instead of 72 pinned-host
tensors copied H->D per step, captured_data.py:44-59); a training step indexes
a view with `jnp.take` inside jit, so no host->device traffic happens in the
hot loop at all.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, NamedTuple

import jax.numpy as jnp
import numpy as np

from drt_tpu.render.camera import CameraM


class ViewBatch(NamedTuple):
    """Stacked views on device (a pytree — passes through jit). Leading axis
    = view index."""

    screen_pixel: jnp.ndarray  # [V,N,3]
    valid: jnp.ndarray         # [V,N] bool
    mask: jnp.ndarray          # [V,resy,resx] soft mask
    origin: jnp.ndarray        # [V,N,3]
    ray_dir: jnp.ndarray       # [V,N,3]
    R: jnp.ndarray             # [V,4,4]
    K: jnp.ndarray             # [V,3,3]
    R_inv: jnp.ndarray         # [V,4,4]
    K_inv: jnp.ndarray         # [V,3,3]

    def take(self, v):
        """Select one view by (traced or concrete) index. Origins stored
        compactly ([V,1,3] when constant per view — pinhole captures) are
        broadcast back to per-pixel here."""
        cam = CameraM(self.R[v], self.K[v], self.R_inv[v], self.K_inv[v])
        origin = self.origin[v]
        if origin.shape[0] == 1 and self.ray_dir.shape[1] != 1:
            origin = jnp.broadcast_to(origin, self.ray_dir[v].shape)
        return (self.screen_pixel[v], self.valid[v], self.mask[v],
                origin, self.ray_dir[v], cam)


@dataclasses.dataclass
class CaptureData:
    """A full capture: 72 views + capture geometry metadata."""

    name: str
    resy: int
    resx: int
    num_views: int
    views: ViewBatch
    num_view_used: int = 72   # HyperParams['num_view'] subsampling for ray loss

    def ray_view_generator(self, seed: int = 0,
                           special_case_mouse: bool = True) -> Iterator[int]:
        """Infinite shuffled stream of ray-loss view indices
        (reference captured_data.py:61-75, including the hardcoded mouse
        view list at :66-69)."""
        step = max(1, self.num_views // max(1, self.num_view_used))
        index = list(np.arange(0, self.num_views, step))
        if special_case_mouse and self.name == "mouse":
            index = list(np.arange(-5, 10)) + list(np.arange(22, 40))
        rng = np.random.default_rng(seed)
        while True:
            rng.shuffle(index)
            for i in index:
                yield int(i) % self.num_views

    def silh_view_generator(self, seed: int = 1) -> Iterator[int]:
        """Infinite shuffled stream over all views
        (reference captured_data.py:77-82)."""
        index = list(np.arange(self.num_views))
        rng = np.random.default_rng(seed)
        while True:
            rng.shuffle(index)
            for i in index:
                yield int(i)


def downsample_capture(cap: CaptureData, k: int) -> CaptureData:
    """Subsample a capture's pixel grid by k in each dimension (keep pixels
    (k·i, k·j)). Lets one full-resolution synthesis cache serve every
    lower-resolution experiment. The intrinsics scale exactly: pixel index
    u' = u/k  =>  K' = diag(1/k, 1/k, 1) @ K (up to the half-pixel-center
    offset, < k/2 px, irrelevant at experiment scale)."""
    v = cap.views
    resy, resx = cap.resy // k, cap.resx // k

    def grid(a):
        """[V, N, ...] flattened row-major -> subsampled + reflattened."""
        full = a.reshape((a.shape[0], cap.resy, cap.resx) + a.shape[2:])
        sub = full[:, ::k, ::k]
        return sub.reshape((a.shape[0], resy * resx) + a.shape[2:])

    scale = jnp.asarray([1.0 / k, 1.0 / k, 1.0], dtype=v.K.dtype)
    K = v.K * scale[None, :, None]
    origin = v.origin if v.origin.shape[1] == 1 else grid(v.origin)
    views = ViewBatch(
        screen_pixel=grid(v.screen_pixel),
        valid=grid(v.valid),
        mask=v.mask[:, ::k, ::k],
        origin=origin,
        ray_dir=grid(v.ray_dir),
        R=v.R, K=K, R_inv=v.R_inv,
        K_inv=jnp.linalg.inv(K.astype(jnp.float64)).astype(v.K_inv.dtype),
    )
    return dataclasses.replace(cap, resy=resy, resx=resx, views=views)


def stack_views(view_list, dtype=jnp.float32) -> ViewBatch:
    """view_list: list of dicts with keys screen_pixel/valid/mask/origin/
    ray_dir/R/K (numpy). Inverses are computed here."""
    def cat(key):
        return np.stack([np.asarray(v[key]) for v in view_list])

    def cat_origin():
        """Store pinhole origins compactly: [V,1,3] when every pixel of a
        view shares one origin (saves ~1GB at capture resolution)."""
        arrs = [np.asarray(v["origin"]) for v in view_list]
        if all((a == a[0]).all() for a in arrs):
            return np.stack([a[:1] for a in arrs])
        return np.stack(arrs)

    R = cat("R").astype(np.float64)
    K = cat("K").astype(np.float64)
    R_inv = np.linalg.inv(R)
    K_inv = np.linalg.inv(K)
    return ViewBatch(
        screen_pixel=jnp.asarray(cat("screen_pixel"), dtype=dtype),
        valid=jnp.asarray(cat("valid").astype(bool)),
        mask=jnp.asarray(cat("mask"), dtype=dtype),
        origin=jnp.asarray(cat_origin(), dtype=dtype),
        ray_dir=jnp.asarray(cat("ray_dir"), dtype=dtype),
        R=jnp.asarray(R, dtype=dtype),
        K=jnp.asarray(K, dtype=dtype),
        R_inv=jnp.asarray(R_inv, dtype=dtype),
        K_inv=jnp.asarray(K_inv, dtype=dtype),
    )
