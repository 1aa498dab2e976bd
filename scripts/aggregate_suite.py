"""Aggregate per-run suite_report.json files into the 8-object table
(VERDICT round-1 item 9: per-object Hausdorff + wall-clock, comparable to
the reference's paper protocol /root/reference/README.md:13).

Usage:
  python scripts/aggregate_suite.py results_r2/long16_* [--out reports/suite_r2]

Writes <out>.json (merged rows) and <out>.md (the table). If an object
appears in several runs the latest row wins.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("--out", default="reports/suite_r2")
    args = ap.parse_args()

    rows = {}
    for d in args.run_dirs:
        p = os.path.join(d, "suite_report.json")
        if not os.path.exists(p):
            print(f"skip (no report): {d}", file=sys.stderr)
            continue
        for r in json.load(open(p)):
            r["run_dir"] = d
            rows[r["object"]] = r

    order = ["hand", "mouse", "dog", "monkey", "horse", "pig", "rabbit",
             "tiger"]
    merged = [rows[o] for o in order if o in rows] + \
             [r for o, r in sorted(rows.items()) if o not in order]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out + ".json", "w") as fh:
        json.dump(merged, fh, indent=1)

    # Two improvement columns: "vs init" compares against the raw carved
    # hull, "vs end-of-pass-0" against the H at the END of pass 0 (first
    # coarse remesh + its full iteration block — checkpoints are written
    # after each pass's optimization, so traj[0] is NOT the optimizer's raw
    # post-remesh start). Rows with no trajectory are excluded from the
    # pass-0 count rather than counted via a sentinel (ADVICE.md round 2).
    lines = [
        "| object | res | views | schedule | init H | end-of-pass0 H "
        "| final H | vs init | vs pass0 | remesh fail | wall-clock (s) |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    n_imp = n_imp0 = n_traj = 0
    fail_total = fail_known = 0
    for r in merged:
        sched = f"{r['passes']}x{r['iters']}"
        traj = r.get("pass_hausdorff_mean")
        imp = r["final_hausdorff_mean"] < r["init_hausdorff_mean"]
        n_imp += imp
        if traj:
            n_traj += 1
            imp0 = "yes" if r["final_hausdorff_mean"] < traj[0] else "NO"
            n_imp0 += imp0 == "yes"
            p0 = traj[0]
        else:
            imp0, p0 = "n/a", "-"
        # remesh-health counters (VERDICT r3 missing #3); rows from runs
        # predating the counters show "-"
        if "remesh_failures" in r:
            rf = f"{r['remesh_failures']}/{r['remesh_attempts']}"
            fail_total += r["remesh_failures"]
            fail_known += 1
        else:
            rf = "-"
        lines.append(
            f"| {r['object']} | {r['resx']}x{r['resy']} | {r['views']} "
            f"| {sched} | {r['init_hausdorff_mean']} | {p0} "
            f"| {r['final_hausdorff_mean']} | {'yes' if imp else 'NO'} "
            f"| {imp0} | {rf} | {r['optimize_s']} |")
    lines.append("")
    lines.append(f"{n_imp}/{len(merged)} objects improved over their raw "
                 f"init; {n_imp0}/{n_traj} over their end-of-pass-0 state.")
    if fail_known:
        lines.append(f"Remesh failures: {fail_total} total across "
                     f"{fail_known} instrumented runs (reference bar: 0 — "
                     f"meshlabserver succeeds or dies, optim.py:51).")
    with open(args.out + ".md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
