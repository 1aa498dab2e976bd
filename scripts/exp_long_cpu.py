"""CPU hedge for the round-2 headline question (TPU tunnel down): does the
reference-length schedule (200-iter passes) descend below the carved init?
Runs mouse at 120x160 (the cached 240x320 capture downsampled 2x), parity
dynamics, 10 passes x 200 iters, per-pass Hausdorff.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np

from drt_tpu.config import HyperParams
from drt_tpu.data import synthesize_capture
from drt_tpu.data.views import downsample_capture
from drt_tpu.mesh.ply import load_ply
from drt_tpu.optimize import optimize
from drt_tpu.remesh import hausdorff_distance

gv, gf = load_ply('/root/reference/data/mouse_scan.ply')
cap = synthesize_capture(gv, gf, name='mouse', num_views=24, resy=240,
                         resx=320, ior=1.4723, num_view_used=24,
                         cache_path='/root/repo/results_r2/fixed_parity/capture_cache/mouse_24v_240x320.npz')
cap = downsample_capture(cap, 2)
print(f'capture downsampled to {cap.resy}x{cap.resx}', flush=True)

z = np.load('/root/repo/results_r2/fixed_parity/capture_cache/mouse_24v_240x320_hull160.npz')
v0, f0 = z['v'], z['f']
h0 = hausdorff_distance(v0, f0, gv, gf)
print(f'carved init: V {len(v0)} H {h0.mean:.4f}', flush=True)

hp = HyperParams(name='mouse', ior=1.4723, num_passes=10, iters=200,
                 start_len=4.0, end_len=2.0, optimizer='sgd', precond='none',
                 start_lr=0.1, num_view=24)
ck = '/root/repo/results_r2/long_cpu_120/checkpoints'
t0 = time.time()
mesh = optimize(hp, cap, v0, f0, remesh_fn='isotropic', checkpoint_dir=ck,
                metrics='/root/repo/results_r2/long_cpu_120/metrics.jsonl',
                log_every=50)
print(f'optimize {time.time()-t0:.0f}s', flush=True)
v, f = mesh.host_arrays()
hf = hausdorff_distance(v, f, gv, gf)
print(f'final: V {len(v)} H {hf.mean:.4f} (init {h0.mean:.4f})', flush=True)
for i in range(10):
    try:
        cv, cf = load_ply(f'{ck}/mouse_pass{i:02d}.ply')
        h = hausdorff_distance(cv, cf, gv, gf)
        print(f'  pass {i}: H {h.mean:.4f}', flush=True)
    except Exception:
        break
