"""Sobolev (Laplacian) gradient preconditioning for vertex optimization.

Round-1 established (BASELINE.md "TPU reconstruction runs") that the
reference's per-vertex SGD dynamics fit high-frequency noise while barely
moving low-frequency shape modes, degrading Hausdorff even though the
gradient field is verified to point toward the ground truth. This module
implements the standard remedy from the inverse-rendering literature
(Nicolet, Jacobson & Jakob, "Large Steps in Inverse Rendering of Geometry",
SIGGRAPH Asia 2021): reparameterize the vertex positions as

    v = (I + lam * L)^{-1} u,

where L is the combinatorial graph Laplacian (D - Adj) of the current mesh.
Optimizing u instead of v premultiplies the gradient by A^{-1} = (I+lam*L)^{-1}
twice (once in the forward substitution, once in the chain rule), which
amplifies smooth displacement modes relative to per-vertex noise by a factor
of (1 + lam*mu)^2 between Laplacian eigenvalues mu. The reference has no
counterpart (its optim.py:155-171 clamp+momentum SGD is the round-1 parity
mode); this is a TPU-framework capability addition targeting reconstruction
quality.

The solve is a matrix-free conjugate-gradient on device
(jax.scipy.sparse.linalg.cg, which is reverse-mode differentiable through
lax.custom_linear_solve with a symmetric operator). The matvec uses the
padded fixed-degree neighbor table from MeshState, so everything is static
shapes; padded vertices have degree 0 and therefore A = I on those lanes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def laplacian_matvec(x: jnp.ndarray, neighbors: jnp.ndarray,
                     neighbor_valid: jnp.ndarray) -> jnp.ndarray:
    """Combinatorial Laplacian L = D - Adj applied to x [Vp,C].

    neighbors: [Vp,D] int32 (invalid entries clamped to 0),
    neighbor_valid: [Vp,D] bool.
    """
    nv = neighbor_valid[..., None]
    nx = jnp.where(nv, x[neighbors], 0.0)            # [Vp,D,C]
    deg = jnp.sum(neighbor_valid, axis=1).astype(x.dtype)
    return deg[:, None] * x - jnp.sum(nx, axis=1)


def sobolev_matvec(x, neighbors, neighbor_valid, lam):
    """A x = (I + lam L) x."""
    return x + lam * laplacian_matvec(x, neighbors, neighbor_valid)


@jax.jit
def sobolev_apply(v, neighbors, neighbor_valid, lam):
    """u = A v (the forward map; used to initialize u from mesh vertices)."""
    return sobolev_matvec(v, neighbors, neighbor_valid, lam)


def sobolev_solve(u, neighbors, neighbor_valid, lam, maxiter: int = 64,
                  tol: float = 1e-6, x0=None):
    """v = A^{-1} u by CG. Differentiable (d/du solve = solve, A symmetric)."""
    A = partial(sobolev_matvec, neighbors=neighbors,
                neighbor_valid=neighbor_valid, lam=lam)
    v, _ = jax.scipy.sparse.linalg.cg(A, u, x0=x0, tol=tol, maxiter=maxiter)
    return v
