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


def laplacian_grad_hook(grad, vertices, neighbors, neighbor_valid,
                        weight: float) -> jnp.ndarray:
    """Gradient-hook regularizer: add `weight * laplacian(vertices)` to the
    vertex gradient (the reference's experimental laplac_hook,
    DiffRender.py:403-409; disabled by default there and here — provided
    for capability parity, usable as an extra optax-style transform)."""
    import jax
    lap = uniform_laplacian_smooth(jax.lax.stop_gradient(vertices),
                                   neighbors, neighbor_valid)
    return weight * lap + grad


def laplacian_normal_grad_hook(grad, vertices, normals, neighbors,
                               neighbor_valid, weight: float,
                               threshold: float = 0.005) -> jnp.ndarray:
    """Normal-projected variant (reference laplac_normal_hook,
    DiffRender.py:411-418): the Laplacian is projected on the vertex normal
    and small magnitudes are zeroed before being added to the gradient."""
    import jax
    lap = uniform_laplacian_smooth(jax.lax.stop_gradient(vertices),
                                   neighbors, neighbor_valid)
    ln = jnp.sum(lap * normals, axis=1, keepdims=True)
    ln = jnp.where(jnp.abs(ln) < threshold, 0.0, ln)
    return weight * ln + grad
