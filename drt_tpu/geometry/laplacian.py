"""Uniform-weight graph Laplacian over padded vertex neighborhoods.

The reference stores a sparse (V x V) uniform-weight matrix built from
trimesh's vertex_neighbors (`Scene.init_weightM`, DiffRender.py:357-370) and
uses it in its (experimental) Laplacian gradient hooks (DiffRender.py:403-418).
On TPU the sparse matvec becomes a dense gather over a padded [V,D] neighbor
table — D is the max vertex degree, small for isotropic meshes.
"""

from __future__ import annotations

import jax.numpy as jnp


def neighbor_average(vertices: jnp.ndarray, neighbors: jnp.ndarray,
                     neighbor_valid: jnp.ndarray) -> jnp.ndarray:
    """weightM @ vertices: per-vertex mean of 1-ring neighbor positions."""
    gathered = vertices[neighbors]                      # [Vp,D,3]
    m = neighbor_valid[..., None]
    s = jnp.sum(jnp.where(m, gathered, 0.0), axis=1)
    cnt = jnp.maximum(jnp.sum(neighbor_valid, axis=1, keepdims=True), 1)
    return s / cnt


def uniform_laplacian_smooth(vertices: jnp.ndarray, neighbors: jnp.ndarray,
                             neighbor_valid: jnp.ndarray) -> jnp.ndarray:
    """Laplacian displacement: vertices − neighbor mean
    (reference laplac_hook, DiffRender.py:403-409)."""
    return vertices - neighbor_average(vertices, neighbors, neighbor_valid)
