"""Real-schema h5 end-to-end reconstructions (VERDICT r3 next-item 5).

For one Pointgray object (mouse: per-pixel rays stored in the file) and one
Redmi object (tiger: rays synthesized from K,R on load), this script:
  1. synthesizes a quick capture of the scan mesh and writes it in the
     EXACT reference schema (cam_proj/cam_k/screen_position/mask
     [+ray_origin/ray_dir], captured_data.py:99-108,141-148);
  2. drives `python -m drt_tpu.cli reconstruct --data file.h5` as a real
     subprocess (load_h5_capture -> carve -> optimize -> export);
  3. evaluates Hausdorff vs the scan GT and records the rows.

Usage: python scripts/h5_e2e.py [--out-dir results_r4/h5] [--passes 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = "/root/reference/data/"


def _tpu_subprocess(cmd, timeout, attempts=3):
    """Run a TPU-using child with retries: the axon PJRT registration is
    intermittent under claim contention (observed: 'axon is not in the list
    of known backends' when another process actively holds the tunnel)."""
    # APPEND to PYTHONPATH — the axon PJRT plugin registers via a
    # sitecustomize on the inherited PYTHONPATH; replacing it leaves the
    # child with JAX_PLATFORMS=axon but no registered axon backend.
    env = dict(os.environ, PYTHONPATH=(
        REPO + os.pathsep + os.environ.get("PYTHONPATH", "")))
    env.update(_TPU_ENV)               # the launch env's TPU settings
    for i in range(attempts):
        r = subprocess.run(cmd, env=env, cwd=REPO, text=True,
                           capture_output=True, timeout=timeout)
        sys.stderr.write(r.stdout[-3000:] + r.stderr[-3000:])
        if r.returncode == 0:
            return r
        sys.stderr.write(f"\n[h5_e2e] attempt {i + 1} rc={r.returncode}; "
                         f"retrying\n")
        time.sleep(20)
    return r


def run_one(name, args):
    import numpy as np
    from drt_tpu.config import POINTGRAY_OBJECTS, POINTGRAY_RES, REDMI_RES
    from drt_tpu.mesh import load_ply
    from drt_tpu.remesh import hausdorff_distance

    resy, resx = (POINTGRAY_RES if name in POINTGRAY_OBJECTS else REDMI_RES)
    resy, resx = resy // args.res_div, resx // args.res_div
    gt_v, gt_f = load_ply(f"{DATA}{name}_scan.ply")

    os.makedirs(args.out_dir, exist_ok=True)
    h5_path = os.path.join(args.out_dir, f"{name}.h5")
    if os.path.exists(h5_path):
        # a killed earlier run can leave a truncated file — verify it opens
        import h5py
        try:
            with h5py.File(h5_path, "r"):
                pass
        except OSError:
            os.remove(h5_path)
    if not os.path.exists(h5_path):
        # synthesis runs on the TPU in its own process (the parent stays on
        # CPU so it never holds the exclusive axon claim while children run)
        r = _tpu_subprocess(
            [sys.executable, os.path.abspath(__file__), "--_synth", name,
             "--views", str(args.views), "--res-div", str(args.res_div),
             "--out-dir", args.out_dir],
            args.timeout)
        if r.returncode != 0:
            return {"object": name, "error": f"synth rc={r.returncode}"}

    t0 = time.time()
    cmd = [sys.executable, "-m", "drt_tpu.cli", "reconstruct",
           "--name", name, "--data", h5_path,
           "--init", "carved", "--carve-res", str(args.carve_res),
           "--passes", str(args.passes), "--iters", str(args.iters),
           "--start-len", "4", "--end-len", "2",
           "--num-view", str(args.views),
           "--result-dir", args.out_dir,
           "--checkpoint-dir", os.path.join(args.out_dir, "ck_" + name),
           "--resume",
           "--metrics", os.path.join(args.out_dir, f"{name}_metrics.jsonl")]
    r = _tpu_subprocess(cmd, args.timeout)
    if r.returncode != 0:
        return {"object": name, "error": f"cli rc={r.returncode}"}

    v, f = load_ply(os.path.join(args.out_dir, f"{name}_recons.ply"))
    h = hausdorff_distance(v, f, gt_v, gt_f)
    # carved-init H for the improvement claim: recarve cheaply from cache
    from drt_tpu.data.captured import load_h5_capture
    from drt_tpu.data.carve import carved_visual_hull, rig_working_volume
    data = load_h5_capture(h5_path, name)
    lo, hi = rig_working_volume(data)
    v0, f0 = carved_visual_hull(data, lo, hi, resolution=args.carve_res,
                                target_len=4.0)
    h0 = hausdorff_distance(v0, f0, gt_v, gt_f)
    row = {"object": name, "rig": "pointgray" if name in POINTGRAY_OBJECTS
           else "redmi", "resy": resy, "resx": resx, "views": args.views,
           "passes": args.passes, "iters": args.iters,
           "h5_schema": "reference captured_data.py:99-108",
           "init_hausdorff_mean": round(float(h0.mean), 4),
           "final_hausdorff_mean": round(float(h.mean), 4),
           "improved": bool(h.mean < h0.mean),
           "wall_s": round(time.time() - t0, 1), "V": len(v), "F": len(f)}
    return row


def _synth_one(name, views, out_dir, res_div=4):
    """Child-process synthesis (TPU): write the exact reference-schema h5."""
    from drt_tpu.config import POINTGRAY_OBJECTS, POINTGRAY_RES, REDMI_RES
    from drt_tpu.data import synthesize_capture
    from drt_tpu.data.captured import save_h5_capture
    from drt_tpu.mesh import load_ply

    resy, resx = (POINTGRAY_RES if name in POINTGRAY_OBJECTS else REDMI_RES)
    resy, resx = resy // res_div, resx // res_div
    gt_v, gt_f = load_ply(f"{DATA}{name}_scan.ply")
    h5_path = os.path.join(out_dir, f"{name}.h5")
    cap = synthesize_capture(
        gt_v, gt_f, name=name, num_views=views, resy=resy,
        resx=resx, ior=1.4723, num_view_used=views,
        cache_path=os.path.join(out_dir, f"{name}_cap.npz"))
    # write-then-rename so a kill never leaves a half-written capture
    save_h5_capture(cap, h5_path + ".tmp")
    os.replace(h5_path + ".tmp", h5_path)


# TPU-relevant launch-env vars, captured before the parent forces itself to
# CPU, so child processes inherit the real TPU configuration.
_TPU_ENV = {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--objects", nargs="*", default=["mouse", "tiger"])
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--carve-res", type=int, default=160)
    ap.add_argument("--res-div", type=int, default=4,
                    help="divide capture resolution (1 = full capture res)")
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--out-dir", default="results_r4/h5")
    ap.add_argument("--report", default="reports/h5_e2e_r4.json")
    ap.add_argument("--_synth", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._synth:
        _synth_one(args._synth, args.views, args.out_dir, args.res_div)
        return

    # Parent: evaluation/bookkeeping only — run on CPU so the exclusive
    # axon TPU claim stays free for the child processes.
    for k in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS"):
        if k in os.environ:
            _TPU_ENV[k] = os.environ[k]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""

    rows = []
    if os.path.exists(args.report):
        rows = json.load(open(args.report))
        done = {r["object"] for r in rows if r.get("improved")}
        args.objects = [o for o in args.objects if o not in done]
    for name in args.objects:
        row = run_one(name, args)
        rows = [r for r in rows if r["object"] != name] + [row]
        print(json.dumps(row), flush=True)
        os.makedirs(os.path.dirname(args.report), exist_ok=True)
        json.dump(rows, open(args.report, "w"), indent=1)


if __name__ == "__main__":
    main()
