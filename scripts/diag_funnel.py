import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from drt_tpu.mesh import build_mesh_state, load_ply
from drt_tpu.intersect import get_intersect_fn
from drt_tpu.render.trace import trace2, render_transparent

z = np.load('result_suite/capture_cache/mouse_24v_240x320.npz')
gt_v, gt_f = load_ply('/root/reference/data/mouse_scan.ply')
ms = build_mesh_state(gt_v, gt_f)
fn = get_intersect_fn('auto')

@jax.jit
def funnel(o, d):
    hits = fn(o, d, ms.vertices, ms.faces, ms.face_valid)
    o2, d2, active, stats, _tris = trace2(o, d, ms, fn, 1.4723, 1.00029)
    res = render_transparent(o, d, ms, fn, 1.4723, 1.00029)
    vr = res.stats['valid_rays']
    return (jnp.sum(hits.hit), stats['active_after_bounce1'],
            stats['active_after_bounce2'], vr)

tot = dict(mask=0, hit=0, b1=0, b2=0, escaped=0, valid_in_cap=0, n=0)
for i in range(4):
    o = jnp.asarray(np.broadcast_to(z[f'or{i}'], z[f'rd{i}'].shape), jnp.float32)
    d = jnp.asarray(z[f'rd{i}'], jnp.float32)
    h, b1, b2, esc = funnel(o, d)
    tot['n'] += d.shape[0]; tot['mask'] += int((z[f'mk{i}'] >= 0.99).sum())
    tot['hit'] += int(h); tot['b1'] += int(b1); tot['b2'] += int(b2)
    tot['escaped'] += int(esc); tot['valid_in_cap'] += int(z[f'va{i}'].sum())
print('funnel over 4 views:', tot)
print('TIR-drop rate bounce1:', round(1 - tot['b1']/max(tot['hit'],1),3),
      'bounce2:', round(1 - tot['b2']/max(tot['b1'],1),3))
print('occluded exits:', tot['b2'] - tot['escaped'])
