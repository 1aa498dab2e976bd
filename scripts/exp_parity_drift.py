"""Decisive rerun of the GT-hold / basin / carve probes under PARITY
dynamics (Nesterov SGD, momentum .95, +-1 clamp, precond none) — the
earlier drift probes all used uadam+h1, whose unit-step normalization
random-walks on pure-noise gradients. This separates objective drift
from optimizer drift."""
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
cap = synthesize_capture(gv, gf, name='mouse', num_views=NV, resy=RESY,
                         resx=RESX, ior=1.4723, num_view_used=NV,
                         cache_path='/root/repo/results_r2/fixed_parity/capture_cache/mouse_24v_240x320.npz')
vg, fg = isotropic_remesh(gv, gf, 2.0)
z = np.load('/root/repo/results_r2/fixed_parity/capture_cache/mouse_24v_240x320_hull160.npz')
vc, fc = isotropic_remesh(z['v'], z['f'], 2.0)
fn = get_intersect_fn('auto')

w_full = LossWeights(ray_w=40.0, vh_w=2e-3, sm_w=0.08, ior=1.4723)
w_ray = LossWeights(ray_w=40.0, vh_w=0.0, sm_w=0.0, ior=1.4723)


def probe(tag, v0, f0, weights, iters, lr0=0.1, every=50):
    ms = build_mesh_state(v0, f0)
    budget = default_silhouette_budget(ms.num_edges)
    init, step, final = make_train_step(fn, weights, RESY, RESX, budget,
                                        optimizer='sgd', precond='none')
    st = init(ms)
    lr = jnp.asarray(lr0, jnp.float32)
    rng = np.random.default_rng(3)
    for it in range(iters + 1):
        ridx = jnp.asarray(rng.integers(0, NV, 1), jnp.int32)
        sidx = jnp.asarray(rng.integers(0, NV, 8), jnp.int32)
        st, loss, aux = step(st, lr, ms, cap.views, ridx, sidx)
        if it % every == 0:
            vf = np.asarray(final(st, ms))[:ms.num_vertices]
            h = hausdorff_distance(vf, np.asarray(ms.faces)[:ms.num_faces],
                                   gv, gf)
            print(f'  [{tag}] it {it}: H {h.mean:.4f} loss {float(loss):.3f} '
                  f'ray {float(aux["ray"]):.2f}', flush=True)


print('=== parity GT-hold (remeshed GT len 2)', flush=True)
probe('gt-hold full', vg, fg, w_full, 200)
probe('gt-hold ray', vg, fg, w_ray, 200)

print('=== parity basin (perturbed GT)', flush=True)
rngp = np.random.default_rng(7)
for amp in (0.3, 1.0):
    # smooth low-frequency perturbation: random 3-term sinusoid field
    ks = rngp.normal(size=(3, 3)) * 0.08
    ph = rngp.uniform(0, 2 * np.pi, 3)
    disp = np.stack([np.sin(vg @ ks[i] + ph[i]) for i in range(3)], -1)
    vp = (vg + amp * disp).astype(np.float32)
    h0 = hausdorff_distance(vp, fg, gv, gf)
    print(f'  amp {amp}: start H {h0.mean:.4f}', flush=True)
    probe(f'basin{amp} full', vp, fg, w_full, 200)

print('=== parity carve descent (len 2)', flush=True)
probe('carve full', vc, fc, w_full, 300)
probe('carve ray', vc, fc, w_ray, 300)
