"""Per-pass Hausdorff trajectory of a suite run's checkpoints.

Usage: python scripts/pass_trajectory.py results_r2/fixed_parity [mouse ...]
Prints init + per-pass mean/rms symmetric-ish (recons->GT) Hausdorff.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from drt_tpu.mesh.ply import load_ply  # noqa: E402
from drt_tpu.remesh import hausdorff_distance  # noqa: E402

DATA = "/root/reference/data/"


def main():
    out_dir = sys.argv[1]
    objects = sys.argv[2:] or ["mouse"]
    for name in objects:
        gt_v, gt_f = load_ply(f"{DATA}{name}_scan.ply")
        rows = []
        ck = os.path.join(out_dir, "checkpoints", name)
        if not os.path.isdir(ck):
            print(f"{name}: no checkpoints at {ck}")
            continue
        for fn in sorted(os.listdir(ck)):
            if fn.endswith(".ply"):
                v, f = load_ply(os.path.join(ck, fn))
                h = hausdorff_distance(v, f, gt_v, gt_f)
                rows.append({"ckpt": fn, "V": len(v),
                             "mean": round(h.mean, 3),
                             "rms": round(h.rms, 3)})
        rep = os.path.join(out_dir, "suite_report.json")
        init_h = None
        if os.path.exists(rep):
            r = json.load(open(rep))
            for row in r:
                if row.get("object") == name:
                    init_h = row.get("init_hausdorff_mean")
        print(f"{name}: init {init_h}")
        for row in rows:
            print(f"  {row['ckpt']}: mean {row['mean']} rms {row['rms']} "
                  f"V {row['V']}")


if __name__ == "__main__":
    main()
