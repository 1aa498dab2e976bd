"""Differentiable 3-vector optics kernels (JAX).

Same capabilities as the reference's TorchScript kernels (DiffRender.py:23-61),
with all the stabilizers that make float32 viable on TPU: clamped radicands,
safe normalization, and NaN-free masked lanes (JAX's `where` leaks NaN
gradients from the untaken branch, so every sqrt/div input is clamped *before*
use). Functions are shape-polymorphic over leading batch dims; vectors live in
the trailing axis of size 3.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot3(a: jnp.ndarray, b: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """Batched 3-vector dot product (reference DiffRender.py:24-29)."""
    out = jnp.sum(a * b, axis=-1)
    return out[..., None] if keepdims else out


def safe_normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Normalize along the last axis; zero vectors map to zero, not NaN."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v / jnp.sqrt(jnp.maximum(n2, eps))


def reflect(wo: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection of outgoing dir `wo` about normal `n`
    (reference DiffRender.py:31-33)."""
    return -wo + 2.0 * dot3(wo, n, keepdims=True) * n


def refract(wo: jnp.ndarray, n: jnp.ndarray, eta,
            compat_cos_from_incident: bool = False):
    """Snell refraction (capability of reference `Refract`, DiffRender.py:35-49).

    wo:  [...,3] unit vector pointing away from the surface toward the source.
    n:   [...,3] unit normal on the same side as wo (dot(n, wo) >= 0).
    eta: scalar or [...], the ratio etaI/etaT.

    Returns (tir [...] bool, wt [...,3] refracted unit dir). For TIR lanes `wt`
    is a finite garbage direction (callers must mask) — never NaN.

    Note: the reference computes cosThetaT from sin²θI instead of sin²θT
    (DiffRender.py:42), which deviates from Snell's law away from normal
    incidence. The default here is the physically correct cosθT = √(1−sin²θT);
    set `compat_cos_from_incident=True` to reproduce the reference's formula
    (direction error is partially hidden by its renormalization, but the exit
    angle still differs at grazing incidence).
    """
    eta = jnp.asarray(eta)
    if eta.ndim:
        eta = eta[..., None]
    cos_i = dot3(n, wo, keepdims=True)
    sin2_i = jnp.clip(1.0 - cos_i * cos_i, 0.0, None)
    sin2_t = eta * eta * sin2_i
    tir = (sin2_t >= 1.0)[..., 0]
    # 1e-12 floor: see fresnel_dielectric — sqrt(0) NaN-poisons reverse AD.
    if compat_cos_from_incident:
        cos_t = jnp.sqrt(jnp.clip(1.0 - sin2_i, 1e-12, 1.0))
    else:
        cos_t = jnp.sqrt(jnp.clip(1.0 - sin2_t, 1e-12, 1.0))
    wt = eta * -wo + (eta * cos_i - cos_t) * n
    # Explicit (non-detached) renormalization, as the reference does
    # (DiffRender.py:47).
    wt = safe_normalize(wt)
    return tir, wt


def fresnel_dielectric(cos_i: jnp.ndarray, eta_i, eta_t):
    """Fresnel reflectance for a dielectric interface
    (capability of reference `FrDielectric`, DiffRender.py:51-61).

    cos_i must be >= 0 (caller flips for exiting rays). Returns (tir, R).
    Division is guarded so TIR lanes stay finite (R is meaningless there and
    must be masked by the caller).
    """
    # Radicand floors: sqrt has an infinite derivative at 0, and reverse-mode
    # AD turns (zero cotangent) * inf into NaN even for *unused* outputs, so
    # exactly-normal incidence (cos_i == 1) must never reach sqrt(0).
    sin_i = jnp.sqrt(jnp.clip(1.0 - cos_i * cos_i, 1e-12, 1.0))
    sin_t = sin_i * eta_i / eta_t
    tir = sin_t >= 1.0
    cos_t = jnp.sqrt(jnp.clip(1.0 - sin_t * sin_t, 1e-12, None))
    denom_parl = eta_t * cos_i + eta_i * cos_t
    denom_perp = eta_i * cos_i + eta_t * cos_t
    r_parl = (eta_t * cos_i - eta_i * cos_t) / jnp.maximum(denom_parl, 1e-12)
    r_perp = (eta_i * cos_i - eta_t * cos_t) / jnp.maximum(denom_perp, 1e-12)
    R = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return tir, R
