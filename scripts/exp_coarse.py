"""Coarse-LOD hypothesis: at edge length ~6 (mouse), vertex motion is
positional (no normal-tilt DOF) — does ray descent from the carved hull
reduce H? Reference dynamics: per-view stochastic SGD + momentum + clamp."""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax.numpy as jnp
from drt_tpu.data.synthetic import synthesize_capture
from drt_tpu.mesh import build_mesh_state
from drt_tpu.mesh.ply import load_ply
from drt_tpu.intersect import get_intersect_fn
from drt_tpu.optimize.loop import make_train_step, default_silhouette_budget
from drt_tpu.optimize.losses import LossWeights
from drt_tpu.remesh.isotropic import isotropic_remesh
from drt_tpu.remesh import hausdorff_distance

RESY, RESX, NV = 240, 320, 24
gv, gf = load_ply('/root/reference/data/mouse_scan.ply')
bbox = gv.max(0) - gv.min(0)
print('mouse scan bbox', np.round(bbox, 2), 'diag %.2f' % np.linalg.norm(bbox),
      flush=True)
cap = synthesize_capture(gv, gf, name='mouse', num_views=NV, resy=RESY,
                         resx=RESX, ior=1.4723, num_view_used=NV,
                         cache_path='/root/repo/results_r2/fixed_parity/capture_cache/mouse_24v_240x320.npz')
z = np.load('/root/repo/results_r2/fixed_parity/capture_cache/mouse_24v_240x320_hull160.npz')
fn = get_intersect_fn('auto')


def probe(tag, v0, f0, weights, iters, lr0, optimizer='sgd', precond='none',
          rvpi=1, every=50):
    ms = build_mesh_state(v0, f0)
    budget = default_silhouette_budget(ms.num_edges)
    init, step, final = make_train_step(fn, weights, RESY, RESX, budget,
                                        optimizer=optimizer, precond=precond,
                                        precond_lambda=9.0, cg_iters=64)
    st = init(ms)
    lr = jnp.asarray(lr0, jnp.float32)
    rng = np.random.default_rng(3)
    for it in range(iters + 1):
        ridx = jnp.asarray(rng.integers(0, NV, rvpi), jnp.int32)
        sidx = jnp.asarray(rng.integers(0, NV, 8), jnp.int32)
        st, loss, aux = step(st, lr, ms, cap.views, ridx, sidx)
        if it % every == 0:
            vf = np.asarray(final(st, ms))[:ms.num_vertices]
            h = hausdorff_distance(vf, np.asarray(ms.faces)[:ms.num_faces],
                                   gv, gf)
            print(f'  [{tag}] it {it}: H {h.mean:.4f} loss {float(loss):.3f} '
                  f'ray {float(aux["ray"]):.2f}', flush=True)


w_ray = LossWeights(ray_w=40.0, vh_w=0.0, sm_w=0.0, ior=1.4723)
w_full = LossWeights(ray_w=40.0, vh_w=2e-3, sm_w=0.08, ior=1.4723)

for L in (8.0, 6.0, 4.0):
    vc, fc = isotropic_remesh(z['v'], z['f'], L)
    h0 = hausdorff_distance(vc, fc, gv, gf)
    print(f'=== carve remeshed len {L}: V {len(vc)} start H {h0.mean:.4f}',
          flush=True)
    probe(f'L{L} sgd ray-only', vc, fc, w_ray, 200, 0.1)
    probe(f'L{L} sgd full', vc, fc, w_full, 200, 0.1)
