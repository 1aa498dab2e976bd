import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from drt_tpu.mesh import build_mesh_state, load_ply
from drt_tpu.intersect import get_intersect_fn
from drt_tpu.render.trace import render_transparent

z = np.load('result_suite/capture_cache/mouse_24v_240x320.npz')
gt_v, gt_f = load_ply('/root/reference/data/mouse_scan.ply')
ms = build_mesh_state(gt_v, gt_f)
fn = get_intersect_fn('auto')
o = jnp.asarray(np.broadcast_to(z['or0'], z['rd0'].shape), jnp.float32)
d = jnp.asarray(z['rd0'], jnp.float32)

import functools
@functools.partial(jax.jit, static_argnames=('rel',))
def run(o, d, rel):
    res = render_transparent(o, d, ms, fn, 1.4723, 1.00029,
                             offset_eps=1e-5)
    return res.stats['active_after_bounce2'], res.stats['occluded_exit'], res.stats['valid_rays']

from drt_tpu.render import trace as T
for rel in (1e-4, 1e-3, 1e-2, 1e-1):
    # patch offset_rel via refract_ray default
    import drt_tpu.render.trace as tr
    orig = tr.refract_ray
    def patched(origin, direction, t, n, i, e, offset_eps=1e-5, offset_rel=rel, compat=False, _orig=orig, _rel=rel):
        return _orig(origin, direction, t, n, i, e, offset_eps, _rel, compat)
    tr.refract_ray = patched
    b2, occ, valid = jax.jit(lambda o, d: run.__wrapped__(o, d, rel))(o, d)
    tr.refract_ray = orig
    print(f"offset_rel={rel:g}: after_b2={int(b2)} occluded={int(occ)} valid={int(valid)}")
