"""The three reconstruction losses and their weighted sum.

Capabilities of the reference's `Loss_calculator` (optim.py:59-130):
- ray_loss: squared difference between rendered exit-ray directions and the
  environment-matting target directions, one view per step (optim.py:91-108).
- silhouette (vh) loss: |soft-mask - 0.5| at silhouette-edge sample pixels,
  8 views per step (optim.py:67-80).
- smoothness (sm) loss: sum of -log(1 + cos dihedral) over edges
  (optim.py:82-89).
- total: ray_w*217.5/resy^2 * ray + vh_w*217.5/resy * vh +
  sm_w*mean_len/10 * sm — the exact normalization constants of
  optim.py:127-129.

All functions are pure and jit-safe; views are selected by (traced) index
into the stacked ViewBatch so the whole step stays on device.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from drt_tpu.geometry.metrics import dihedral_cos
from drt_tpu.geometry.vec import safe_normalize
from drt_tpu.render.silhouette import primary_visibility
from drt_tpu.render.trace import render_transparent


class LossWeights(NamedTuple):
    ray_w: float
    vh_w: float
    sm_w: float
    ior: float
    ext_ior: float = 1.00029
    bilinear_mask: bool = False   # see silhouette_loss
    huber: float = 0.0            # see ray_loss; 0 = reference-parity L2
    compat: bool = False          # reference-exact refraction chain (see
                                  # render/trace.refract_ray); use with f64


def ray_loss(mesh, view, intersect_fn: Callable, ior: float,
             ext_ior: float, collect_evidence: bool = False,
             huber: float = 0.0, ray_chunk: int = -1,
             compat: bool = False, ray_shard_count: int = 1) -> jnp.ndarray:
    """One-view refraction loss (reference optim.py:91-108).

    collect_evidence=True also returns, in the stats dict under
    "vertex_evidence", the per-vertex count of contributing rays (each
    valid ray votes for the 3 vertices of both refraction triangles) —
    the diagonal preconditioner of the 'h1' optimizer mode.

    huber > 0 applies a Huber robustification to each ray's direction
    residual. Even at ground truth the plain L2 loss has a large floor
    (~20% of its visual-hull value) carried by chaotic rays —
    grazing/TIR-adjacent paths whose exit direction is O(1) wrong under
    any infinitesimal surface perturbation. Real environment matting marks
    exactly those pixels invalid (the matting itself fails there); a
    synthetic capture keeps them, and their unbounded influence drives the
    mesh OFF the true surface (measured: full-batch H1 flow diverges
    H 0.05 -> 0.23 from near-GT without this). Huber caps each ray's
    influence at `huber` while staying exactly L2 below it.
    huber=0 is the reference's plain L2 (optim.py:104-107).

    ray_chunk: process the ray batch in sequential chunks of this size with
    rematerialization (render/chunked.py), so per-ray intermediates never
    exist for more than one chunk — the memory scalability the BASELINE
    config-5 tiger workload (8.3M rays) needs. -1 = auto policy (chunk only
    batches larger than a full Redmi view), 0 = never chunk."""
    from drt_tpu.render.chunked import auto_ray_chunk, chunked_sum

    screen_pixel, valid, _mask, origin, ray_dir, _cam = view
    if ray_chunk < 0:
        ray_chunk = auto_ray_chunk(origin.shape[0])

    def body(screen_pixel, valid, origin, ray_dir):
        # lane_mask=valid: matting-invalid pixels (and the chunked path's
        # padding lanes, padded valid=False) start inactive — identical loss
        # and gradient (they were masked at the loss anyway), clean stats.
        res = render_transparent(origin, ray_dir, mesh, intersect_fn, ior,
                                 ext_ior, lane_mask=valid, compat=compat,
                                 ray_shard_count=ray_shard_count)
        # Target direction: from the (detached) exit origin to the matted
        # screen point (optim.py:100-102).
        target = screen_pixel - jax.lax.stop_gradient(res.origin)
        target = safe_normalize(target)
        diff = res.direction - target
        w = valid & res.valid
        m = w[:, None]
        stats = dict(res.stats)
        if collect_evidence:
            ev = jnp.zeros(mesh.vertices.shape[:1], jnp.float32)
            wf = w.astype(jnp.float32)[:, None]
            for tri in res.tris:
                ev = ev.at[mesh.faces[tri]].add(
                    jnp.broadcast_to(wf, (tri.shape[0], 3)))
            stats["vertex_evidence"] = ev
        s = jnp.sum(jnp.where(m, diff * diff, 0.0), axis=1)
        if huber:
            r = jnp.sqrt(jnp.maximum(s, 1e-24))
            s = jnp.where(r <= huber, s, 2.0 * huber * r - huber * huber)
        return jnp.sum(jnp.where(w, s, 0.0)), stats

    return chunked_sum(body, (screen_pixel, valid, origin, ray_dir),
                       ray_chunk, pad_values=(0.0, False, 0.0, 1.0))


def silhouette_loss(mesh, view, intersect_fn: Callable, budget: int,
                    resy: int, resx: int,
                    bilinear_mask: bool = False) -> jnp.ndarray:
    """One-view silhouette loss (reference optim.py:67-80): the soft mask
    sampled at each boundary-crossing silhouette edge vs the 0.5 level.

    bilinear_mask=False reproduces the reference's integer truncation of the
    sample point (DiffRender.py:245); True samples the soft mask bilinearly,
    removing the +-half-pixel bias (helpful at low capture resolutions)."""
    _sp, _valid, mask_img, origin, _rd, cam = view
    cam_origin = origin[0]
    samples = primary_visibility(mesh, cam, cam_origin, intersect_fn,
                                 budget, resy, resx, detach_depth=True)
    if bilinear_mask:
        fx = samples.pixel_f[:, 0]
        fy = samples.pixel_f[:, 1]
        x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, resx - 2)
        y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, resy - 2)
        wx = jnp.clip(fx - x0, 0.0, 1.0)
        wy = jnp.clip(fy - y0, 0.0, 1.0)
        m00 = mask_img[y0, x0]
        m01 = mask_img[y0, x0 + 1]
        m10 = mask_img[y0 + 1, x0]
        m11 = mask_img[y0 + 1, x0 + 1]
        picked = ((1 - wy) * ((1 - wx) * m00 + wx * m01)
                  + wy * ((1 - wx) * m10 + wx * m11))
    else:
        picked = mask_img[samples.pixel[:, 1], samples.pixel[:, 0]]
    # |residual| with subgradient 0 at exactly-zero residual (torch's abs
    # convention; jnp.abs uses +1 there). This matters: silhouette samples
    # land on mask-boundary pixels whose soft value is EXACTLY the 0.5
    # level (process_mask's transition band, captured_data.py:12-20), and
    # an edge already on the boundary must contribute zero gradient — the
    # jnp.abs convention pushes it off. Verified against the reference's
    # own backward in tests/test_reference_parity.py.
    diff = picked - samples.output
    per_edge = jax.lax.stop_gradient(jnp.sign(diff)) * diff
    return jnp.sum(jnp.where(samples.valid, per_edge, 0.0)), samples.count


def smooth_loss(mesh) -> jnp.ndarray:
    """Dihedral smoothness (reference optim.py:82-89). The log argument is
    floored: a perfectly folded edge (cos=-1) gives a huge-but-finite penalty
    instead of the reference's inf."""
    cosd = dihedral_cos(mesh.vertices, mesh.faces, mesh.edge_faces)
    term = -jnp.log(jnp.maximum(1.0 + cosd, 1e-12))
    return jnp.sum(jnp.where(mesh.edge_valid, term, 0.0))


def total_loss(mesh, views, ray_view_idx, silh_view_idx, intersect_fn,
               weights: LossWeights, resy: int, resx: int,
               silhouette_budget: int, collect_evidence: bool = False,
               ray_chunk: int = -1, ray_shard_count: int = 1):
    """Weighted sum (reference all_loss, optim.py:110-130). silh_view_idx is
    a static-length [S] array of view indices (the reference uses 8).
    ray_view_idx may be a scalar (reference parity: 1 refraction view per
    step, optim.py:95) or a [R] array — multiple views are averaged, which
    tames the per-view gradient noise of low-resolution captures (the
    reference's regime is ~1.2M rays/view where one view suffices)."""
    if weights.ray_w:
        ray_view_idx = jnp.atleast_1d(jnp.asarray(ray_view_idx))

        def one_ray(idx):
            return ray_loss(mesh, views.take(idx), intersect_fn,
                            weights.ior, weights.ext_ior,
                            collect_evidence=collect_evidence,
                            huber=weights.huber, ray_chunk=ray_chunk,
                            compat=weights.compat,
                            ray_shard_count=ray_shard_count)

        rls, stats = jax.lax.map(one_ray, ray_view_idx)
        rl = jnp.mean(rls)
        # counters sum to scalars; the [R,V] evidence stack sums per vertex
        trace_stats = {k: jnp.sum(v, axis=0) if k == "vertex_evidence"
                       else jnp.sum(v) for k, v in stats.items()}
    else:
        rl, trace_stats = 0.0, {}

    if weights.vh_w:
        def one(idx):
            return silhouette_loss(mesh, views.take(idx), intersect_fn,
                                   silhouette_budget, resy, resx,
                                   bilinear_mask=weights.bilinear_mask)
        vhs, silh_counts = jax.lax.map(one, silh_view_idx)
        vh = jnp.sum(vhs)
        # True per-view silhouette-edge counts: the driver compares the max
        # against the static budget and grows it — no silent truncation.
        silh_edge_max = jnp.max(silh_counts)
    else:
        vh, silh_edge_max = 0.0, jnp.asarray(0, jnp.int32)

    sm = smooth_loss(mesh) if weights.sm_w else 0.0

    total = (weights.ray_w * 217.5 / resy / resy * rl
             + weights.vh_w * 217.5 / resy * vh
             + weights.sm_w * mesh.mean_len / 10.0 * sm)
    aux = {"ray": rl, "vh": vh, "sm": sm, "silh_edge_max": silh_edge_max,
           **trace_stats}
    return total, aux
