"""Worker process for the 2-process jax.distributed test (run by
tests/test_multihost.py, one instance per simulated host).

Exercises the real multi-host code path: init_multihost ->
shard_rays_for_host -> per-host data loading -> global sharded array ->
a jitted loss whose sum requires a cross-process all-reduce. Prints the
loss so the parent can compare against the single-process value.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    coordinator, num_procs, pid = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]))
    from drt_tpu.parallel.multihost import init_multihost, shard_rays_for_host
    init_multihost(coordinator_address=coordinator,
                   num_processes=num_procs, process_id=pid)

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == num_procs, jax.process_count()
    devices = jax.devices()                      # global: one per process

    from tests.meshes import make_icosphere
    from drt_tpu.mesh import build_mesh_state
    from drt_tpu.intersect import get_intersect_fn

    v, f = make_icosphere(subdivisions=2, radius=50.0)
    ms = build_mesh_state(v, f)

    # deterministic global ray batch; each host materializes ONLY its slice
    n_rays = 4096
    rng = np.random.default_rng(0)
    cam = np.array([200.0, 10.0, 40.0])
    targets = rng.normal(scale=30.0, size=(n_rays, 3))
    d_all = targets - cam
    d_all /= np.linalg.norm(d_all, axis=1, keepdims=True)

    sl = shard_rays_for_host(n_rays)
    local_d = d_all[sl].astype(np.float32)
    local_o = np.broadcast_to(cam, local_d.shape).astype(np.float32)

    mesh = Mesh(np.asarray(devices), ("rays",))
    sharding = NamedSharding(mesh, P("rays", None))
    d_g = jax.make_array_from_process_local_data(sharding, local_d,
                                                 (n_rays, 3))
    o_g = jax.make_array_from_process_local_data(sharding, local_o,
                                                 (n_rays, 3))

    intersect = get_intersect_fn("brute")

    @jax.jit
    def loss_fn(o, d, verts):
        from drt_tpu.render.trace import render_transparent
        m = ms.with_vertices(verts)
        res = render_transparent(o, d, m, intersect, 1.4723, 1.00029)
        # cross-host all-reduce: scalar sum over the sharded ray axis
        return jnp.sum(jnp.where(res.valid, jnp.sum(res.direction, axis=1),
                                 0.0)), jnp.sum(res.valid)

    loss, nvalid = loss_fn(o_g, d_g, ms.vertices)
    print(f"MULTIHOST_RESULT {pid} {float(loss):.6f} {int(nvalid)}",
          flush=True)


if __name__ == "__main__":
    main()
