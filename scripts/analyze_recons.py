"""Post-run reconstruction analysis: per-region error vs ground truth,
volume/area trajectory across checkpoints, per-view ray-loss residuals.

Usage: python scripts/analyze_recons.py result_full2 hand
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drt_tpu.mesh import load_ply  # noqa: E402
from drt_tpu.remesh import hausdorff_distance  # noqa: E402
from drt_tpu.remesh.surface import SurfaceIndex  # noqa: E402


def vol_area(v, f):
    tri = v[f]
    vol = np.einsum('ij,ij->i', tri[:, 0],
                    np.cross(tri[:, 1], tri[:, 2])).sum() / 6
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1).sum()
    return vol, area


def main(result_dir, name):
    gv, gf = load_ply(f"/root/reference/data/{name}_scan.ply")
    hv, hf = load_ply(f"/root/reference/data/{name}_vh.ply")
    print(f"scan: vol/area {vol_area(gv, gf)}")
    print(f"hull: vol/area {vol_area(hv, hf)}  "
          f"hausd {hausdorff_distance(hv, hf, gv, gf).mean:.3f} "
          f"(one-sided {hausdorff_distance(hv, hf, gv, gf, symmetric=False).mean:.3f})")

    cks = sorted(glob.glob(os.path.join(result_dir, "checkpoints",
                                        f"{name}_pass*.ply")))
    final = os.path.join(result_dir, f"{name}_recons.ply")
    paths = cks + ([final] if os.path.exists(final) else [])
    si = SurfaceIndex(gv, gf)
    for p in paths:
        v, f = load_ply(p)
        h = hausdorff_distance(v, f, gv, gf)
        one = hausdorff_distance(v, f, gv, gf, symmetric=False)
        vol, area = vol_area(v, f)
        _, d = si.closest_points(v)
        # split error by height (y axis = object up for the bundled rigs)
        y = v[:, 1]
        lo, hi = np.quantile(y, [0.25, 0.75])
        print(f"{os.path.basename(p)}: V={len(v)} hausd={h.mean:.3f} "
              f"one={one.mean:.3f} vol={vol:.0f} area={area:.0f} "
              f"d[y<q25]={d[y < lo].mean():.3f} "
              f"d[mid]={d[(y >= lo) & (y <= hi)].mean():.3f} "
              f"d[y>q75]={d[y > hi].mean():.3f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "result_full2",
         sys.argv[2] if len(sys.argv) > 2 else "hand")
