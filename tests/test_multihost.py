"""Multi-host execution path (VERDICT.md round-1 item 5): a REAL 2-process
jax.distributed run on localhost driving init_multihost +
shard_rays_for_host + a sharded render whose reduction crosses processes.
The distributed loss must match a single-process computation of the same
global ray batch."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    import jax
    import jax.numpy as jnp
    from tests.meshes import make_icosphere
    from drt_tpu.mesh import build_mesh_state
    from drt_tpu.intersect import get_intersect_fn
    from drt_tpu.render.trace import render_transparent

    v, f = make_icosphere(subdivisions=2, radius=50.0)
    ms = build_mesh_state(v, f)
    n_rays = 4096
    rng = np.random.default_rng(0)
    cam = np.array([200.0, 10.0, 40.0])
    targets = rng.normal(scale=30.0, size=(n_rays, 3))
    d = (targets - cam)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(cam, d.shape)
    res = render_transparent(jnp.asarray(o, jnp.float32),
                             jnp.asarray(d, jnp.float32), ms,
                             get_intersect_fn("brute"), 1.4723, 1.00029)
    loss = jnp.sum(jnp.where(res.valid, jnp.sum(res.direction, axis=1), 0.0))
    return float(loss), int(jnp.sum(res.valid))


def test_two_process_distributed_matches_single():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
                "XLA_FLAGS": ""})   # 1 device per process, no TPU claim
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(root, "tests",
                                          "multihost_worker.py"),
             coordinator, "2", str(pid)],
            cwd=root, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
            assert p.returncode == 0, out[-3000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MULTIHOST_RESULT"):
                _tag, pid, loss, nvalid = line.split()
                results[int(pid)] = (float(loss), int(nvalid))
    assert set(results) == {0, 1}, outs

    ref_loss, ref_nvalid = _single_process_reference()
    for pid, (loss, nvalid) in results.items():
        assert nvalid == ref_nvalid, (pid, nvalid, ref_nvalid)
        np.testing.assert_allclose(loss, ref_loss, rtol=1e-5)
