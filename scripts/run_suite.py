"""8-object reconstruction suite (BASELINE.json config 4).

Runs the full LOD reconstruction for each bundled object from a synthetic
capture of its scan mesh, evaluates Hausdorff vs the scan ground truth, and
writes a JSON report. Intended for TPU (hours of compute at full settings);
the --quick flag runs a reduced schedule.

Usage:
  python scripts/run_suite.py [--objects hand mouse ...] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALL_OBJECTS = ["hand", "mouse", "dog", "monkey", "horse", "pig", "rabbit",
               "tiger"]


def run_object(name, args):
    import numpy as np
    from drt_tpu.config import (HyperParams, POINTGRAY_OBJECTS,
                                POINTGRAY_RES, REDMI_RES, DEFAULT_DATA_PATH)
    from drt_tpu.data import synthesize_capture
    from drt_tpu.mesh import load_ply, save_ply
    from drt_tpu.optimize import optimize
    from drt_tpu.remesh import hausdorff_distance

    resy, resx = (POINTGRAY_RES if name in POINTGRAY_OBJECTS else REDMI_RES)
    div = 4 if args.quick else args.res_div
    resy, resx = resy // div, resx // div

    gt_v, gt_f = load_ply(f"{DEFAULT_DATA_PATH}{name}_scan.ply")

    cache = os.path.join(args.out_dir, "capture_cache",
                         f"{name}_{args.views}v_{resy}x{resx}.npz")
    t0 = time.time()
    cap = synthesize_capture(gt_v, gt_f, name=name, num_views=args.views,
                             resy=resy, resx=resx, ior=1.4723,
                             num_view_used=args.views, cache_path=cache)
    t_synth = time.time() - t0

    if args.init == "carved":
        # Self-consistent init: carve the hull from the capture's own masks
        # (the consistency the reference's real data has — VERDICT.md item 2).
        from drt_tpu.data.carve import carved_visual_hull
        c = 0.5 * (gt_v.min(0) + gt_v.max(0))
        half = 0.62 * (gt_v.max(0) - gt_v.min(0)).max()
        carve_cache = os.path.join(args.out_dir, "capture_cache",
                                   f"{name}_{args.views}v_{resy}x{resx}"
                                   f"_hull{args.carve_res}.npz")
        if os.path.exists(carve_cache):
            z = np.load(carve_cache)
            v0, f0 = z["v"], z["f"]
        else:
            v0, f0 = carved_visual_hull(cap, c - half, c + half,
                                        resolution=args.carve_res,
                                        target_len=10.0)
            np.savez_compressed(carve_cache, v=v0, f=f0)
    else:
        v0, f0 = load_ply(f"{DEFAULT_DATA_PATH}{name}_vh.ply")

    hp = HyperParams(name=name, ior=1.4723,
                     num_passes=args.passes, iters=args.iters,
                     start_len=args.start_len, end_len=args.end_len,
                     optimizer=args.optimizer, precond=args.precond,
                     precond_lambda=args.lam, start_lr=args.lr,
                     lr_schedule=args.lr_schedule,
                     no_coarsen=args.no_coarsen,
                     coarsen_policy=args.coarsen_policy,
                     ray_views_per_iter=args.rvpi,
                     ray_w=args.ray_w, sm_w=args.sm_w, vh_w=args.vh_w,
                     huber=args.huber)
    ck = os.path.join(args.out_dir, "checkpoints", name)
    t0 = time.time()
    run_info = {}
    mesh = optimize(hp, cap, v0, f0, remesh_fn="isotropic",
                    checkpoint_dir=ck, resume=args.resume,
                    metrics=os.path.join(args.out_dir, f"{name}_metrics.jsonl"),
                    run_info=run_info)
    t_opt = time.time() - t0

    v, f = mesh.host_arrays()
    save_ply(os.path.join(args.out_dir, f"{name}_recons.ply"), v, f)
    init_h = hausdorff_distance(v0, f0, gt_v, gt_f)
    final_h = hausdorff_distance(v, f, gt_v, gt_f)
    # per-pass H trajectory from the checkpoints (the quantity that showed
    # the 8x200 run descending monotonically — BASELINE.md round-2 finding)
    traj = []
    for i in range(args.passes):
        p = os.path.join(ck, f"{name}_pass{i:02d}.ply")
        if os.path.exists(p):
            cv, cf = load_ply(p)
            traj.append(round(hausdorff_distance(cv, cf, gt_v, gt_f).mean, 4))
    return {
        "object": name, "resy": resy, "resx": resx, "views": args.views,
        "passes": args.passes, "iters": args.iters,
        "init": args.init, "optimizer": args.optimizer,
        "precond": args.precond, "lr_schedule": args.lr_schedule,
        "no_coarsen": args.no_coarsen,
        "coarsen_policy": args.coarsen_policy,
        "synth_s": round(t_synth, 1), "optimize_s": round(t_opt, 1),
        "init_hausdorff_mean": round(init_h.mean, 4),
        "final_hausdorff_mean": round(final_h.mean, 4),
        "final_hausdorff_rms": round(final_h.rms, 4),
        "pass_hausdorff_mean": traj,
        "V": len(v), "F": len(f),
        # remesh-health counters (VERDICT r3 missing #3): the reference's
        # meshlabserver succeeds every pass or dies (optim.py:51); any
        # nonzero failures here means silent fixed-topology passes.
        **run_info,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--objects", nargs="*", default=ALL_OBJECTS)
    ap.add_argument("--views", type=int, default=72)
    ap.add_argument("--passes", type=int, default=10)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--end-len", type=float, default=2.0)
    ap.add_argument("--start-len", type=float, default=10.0,
                    help="LOD start edge length. The reference's 10 suits "
                         "its crude upstream hulls; a carved init at "
                         "--carve-res 160 carries ~1.4-unit detail, so ~4 "
                         "preserves it (remesh at >=2 is drift-free, "
                         "BASELINE.md round-2 notes)")
    ap.add_argument("--huber", type=float, default=0.0,
                    help="Huber delta on per-ray residuals (0 = L2 parity)")
    ap.add_argument("--quick", action="store_true",
                    help="quarter resolution for smoke runs")
    ap.add_argument("--res-div", type=int, default=1,
                    help="divide the capture resolution by this factor "
                         "(resolution-ablation runs; --quick forces 4)")
    ap.add_argument("--init", choices=["carved", "upstream"],
                    default="carved",
                    help="carved: space-carve the hull from the capture's "
                         "own masks (self-consistent); upstream: the "
                         "reference's bundled *_vh.ply")
    ap.add_argument("--carve-res", type=int, default=160)
    ap.add_argument("--optimizer", default="uadam",
                    choices=["sgd", "adam", "uadam"])
    ap.add_argument("--precond", default="sobolev",
                    choices=["none", "sobolev", "h1"])
    ap.add_argument("--lam", type=float, default=29.0)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--lr-schedule", default="reciprocal",
                    choices=["reciprocal", "len"])
    ap.add_argument("--coarsen-policy", default="auto",
                    choices=["schedule", "clamp", "skip"],
                    help="remesh policy while the LOD target is coarser "
                         "than the init's mean edge length (config.py)")
    ap.add_argument("--no-coarsen", action="store_true",
                    help="clamp the LOD remesh target to the init mesh's "
                         "mean edge length (never coarsen a carved init "
                         "below its own detail — VERDICT round-2 item 5)")
    ap.add_argument("--rvpi", type=int, default=1,
                    help="refraction views averaged per iteration")
    ap.add_argument("--ray-w", type=float, default=40.0)
    ap.add_argument("--sm-w", type=float, default=0.08)
    ap.add_argument("--vh-w", type=float, default=2e-3)
    ap.add_argument("--resume", action="store_true",
                    help="resume each object from its last pass checkpoint "
                         "(tunnel-blip resilience; fresh start if none)")
    ap.add_argument("--out-dir", default="result_suite")
    args = ap.parse_args()

    from drt_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    os.makedirs(args.out_dir, exist_ok=True)
    report_path = os.path.join(args.out_dir, "suite_report.json")
    report = []
    if os.path.exists(report_path):
        report = json.load(open(report_path))
        done = {r["object"] for r in report}
        args.objects = [o for o in args.objects if o not in done]

    for name in args.objects:
        print(f"=== {name} ===", flush=True)
        rec = run_object(name, args)
        report.append(rec)
        json.dump(report, open(report_path, "w"), indent=1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
