"""Active-ray Morton re-sort for incoherent oracle queries.

The reference gets spatial coherence for free: OptiX Prime's BVH traversal
reorders work internally (optix_extend.cpp:29-57 just hands it a ray soup).
Here the Pallas kernel's cheap tile-frustum prepass (pallas_kernel.py
`_candidates_tile`) needs the 512 rays of a tile to be spatially coherent —
true for camera pixels (bounce 1), false for post-refraction interior and
exit rays, whose tile frustums straddle direction octants and blow up to
near-full candidate lists. The previous fix ran those queries with the exact
per-ray prepass instead — O(N * NC) slab tests, which the round-4 profile
put at ~57% of the whole train step on streaming meshes (q2 41.7 ms vs q1
19.2 ms on the mouse full view, reports/profile_fwd.json).

This module restores coherence instead of paying for its absence: permute
the rays by a (direction-octant, origin-Morton) key so each 512-ray tile is
octant-pure and spatially local, run the oracle with the tile-frustum
prepass, and scatter the hits back. The sort is oracle-internal: inputs are
stop_gradient'd by the api wrapper, outputs are per-ray and permutation-
equivariant, so gradients never see the permutation. Parked dead lanes
(render/trace._park_rays puts them outside the AABB pointing away) share one
far bin, so they cluster into all-parked tiles whose frustums miss every
chunk — zero kernel work, same as before.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drt_tpu.intersect.api import Hits


def _spread3(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of each int32 so consecutive bits land 3
    apart (the standard Morton bit-twiddle)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_keys(origins: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """[N] int32 sort keys: direction octant (3 bits) then a 27-bit Morton
    code of the origin quantized against the batch's own origin AABB.
    Octant-major ordering makes sorted tiles sign-pure in every direction
    component, which keeps the tile-frustum inverse-direction intervals
    bounded (see pallas_kernel._candidates_tile)."""
    o = origins.astype(jnp.float32)
    lo = jnp.min(o, axis=0)
    span = jnp.maximum(jnp.max(o, axis=0) - lo, 1e-20)
    q = jnp.clip((o - lo) / span * 511.0, 0.0, 511.0).astype(jnp.int32)
    m = (_spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1)
         | (_spread3(q[:, 2]) << 2))                       # 27 bits
    octant = ((dirs[:, 0] < 0).astype(jnp.int32)
              | ((dirs[:, 1] < 0).astype(jnp.int32) << 1)
              | ((dirs[:, 2] < 0).astype(jnp.int32) << 2))  # 3 bits
    return (octant << 27) | m


def resorted_intersect(fn, origins, dirs, vertices, faces, face_valid,
                       **kw) -> Hits:
    """Run `fn` on Morton-sorted rays and scatter the hits back to the
    original lane order. Exactness is untouched: the oracle is per-ray
    independent, so a permutation conjugation is the identity."""
    keys = morton_keys(origins, dirs)
    order = jnp.argsort(keys).astype(jnp.int32)
    hits = fn(origins[order], dirs[order], vertices, faces, face_valid, **kw)
    n = order.shape[0]
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return Hits(hits.t[inv], hits.tri_id[inv])
