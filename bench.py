"""Benchmark: rays/s through the 2-bounce refraction trace, forward+backward.

The BASELINE.json metric. Workload: the bundled mouse visual-hull mesh
(V=4625, F=9246 — reference data/mouse_vh.ply), a synthetic camera view, and
the full differentiable pipeline per iteration: 3 closest-hit oracle queries
(2 bounces + exit occlusion, reference DiffRender.py:425-426,538,542),
Moller-Trumbore re-intersection, Snell/Fresnel chain, ray loss, and the
backward pass to vertex gradients.

The reference publishes no numbers (BASELINE.md); the recorded baseline is
this framework's own initial brute-force implementation measured on the
single available TPU chip. `vs_baseline` = measured rays/s divided against
BASELINE_RAYS_PER_S (the round-1 brute-force figure), so later rounds show
kernel speedups as >1.
"""

import json
import time

import numpy as np

# Self-established baseline (the reference publishes none, BASELINE.md):
# the first working implementation of this pipeline — brute-force all-pairs
# oracle — measured at 440,538 rays/s fwd+bwd on one TPU v5e chip
# (mouse_vh, 256x256 rays, 2026-08-17). vs_baseline > 1 means the current
# backend beats that starting point.
BASELINE_RAYS_PER_S = 4.4e5


def main(n_side: int = 256, iters: int = 10):
    import jax
    import jax.numpy as jnp
    from drt_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from drt_tpu.geometry.vec import safe_normalize
    from drt_tpu.intersect import get_intersect_fn
    from drt_tpu.mesh import build_mesh_state, load_ply
    from drt_tpu.render import render_transparent

    v, f = load_ply("/root/reference/data/mouse_vh.ply")
    ms = build_mesh_state(v, f)
    intersect_fn = get_intersect_fn("auto")
    ior, ext_ior = 1.4723, 1.00029

    center = v.mean(axis=0)
    radius = float(np.linalg.norm(v - center, axis=1).max())
    cam = center + np.array([3.5 * radius, 0.0, 0.0])
    ys, zs = np.meshgrid(np.linspace(-1, 1, n_side), np.linspace(-1, 1, n_side))
    targets = center + radius * 0.9 * np.stack(
        [np.zeros_like(ys), ys, zs], axis=-1).reshape(-1, 3)
    d = targets - cam
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    origin = jnp.asarray(np.broadcast_to(cam, d.shape), jnp.float32)
    ray_dir = jnp.asarray(d, jnp.float32)
    screen_point = jnp.asarray(center - np.array([2.5 * radius, 0, 0]),
                               jnp.float32)
    n_rays = origin.shape[0]

    def loss_fn(vertices):
        m = ms.with_vertices(vertices)
        res = render_transparent(origin, ray_dir, m, intersect_fn, ior,
                                 ext_ior)
        target = safe_normalize(screen_point - res.origin)
        diff = res.direction - target
        return jnp.sum(jnp.where(res.valid[:, None], diff * diff, 0.0))

    step = jax.jit(jax.grad(loss_fn))

    g = step(ms.vertices)
    g.block_until_ready()                      # compile + warmup
    g = step(ms.vertices)
    g.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(ms.vertices)
    g.block_until_ready()
    dt = time.perf_counter() - t0

    rays_per_s = n_rays * iters / dt
    print(json.dumps({
        "metric": "rays/s fwd+bwd 2-bounce refraction (mouse_vh, "
                  f"{n_side}x{n_side} rays, 1 chip)",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    import sys
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    main(n_side=n)
