"""Combine the parity and advanced-stack full-res suites into one table
with a per-object parity-vs-advanced delta column (VERDICT r4 next-item 1:
the suite-wide evidence that the h1+uadam+len stack is a capability, not an
anecdote).

Usage:
  python scripts/combined_report.py \
    --parity reports/suite_r5_8obj_fullres.json \
    --adv reports/suite_r5_adv_fullres.json \
    --out reports/suite_r5_parity_vs_adv
"""

from __future__ import annotations

import argparse
import json
import os

ORDER = ["hand", "mouse", "dog", "monkey", "horse", "pig", "rabbit", "tiger"]


def load_rows(path):
    try:
        return {r["object"]: r for r in json.load(open(path))}
    except (OSError, ValueError):
        return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", default="reports/suite_r5_8obj_fullres.json")
    ap.add_argument("--adv", default="reports/suite_r5_adv_fullres.json")
    ap.add_argument("--out", default="reports/suite_r5_parity_vs_adv")
    args = ap.parse_args()

    par = load_rows(args.parity)
    adv = load_rows(args.adv)
    objs = [o for o in ORDER if o in par or o in adv] + sorted(
        (set(par) | set(adv)) - set(ORDER))

    lines = [
        "# Parity vs advanced stack — full resolution, 72 views, 20x200",
        "",
        "parity = sgd + no preconditioner + reciprocal lr (the reference's",
        "exact dynamics, optim.py:147-169); advanced = uadam + h1 evidence",
        "preconditioner + len lr schedule (this framework's addition).",
        "Hausdorff mean vs the scan ground truth, reference protocol",
        "(README.md:13). delta = parity - advanced (positive: advanced",
        "wins).",
        "",
        "| object | init H | parity final | advanced final | delta "
        "| adv wins | parity fail | adv fail |",
        "|---|---|---|---|---|---|---|---|",
    ]
    rows_out, n_both, n_adv_wins = [], 0, 0
    for o in objs:
        p, a = par.get(o), adv.get(o)
        init_h = (p or a)["init_hausdorff_mean"]
        pf = p["final_hausdorff_mean"] if p else None
        af = a["final_hausdorff_mean"] if a else None
        delta = round(pf - af, 4) if (pf is not None and af is not None) \
            else None
        if delta is not None:
            n_both += 1
            n_adv_wins += delta > 0
        def fails(r):
            return (f"{r['remesh_failures']}/{r['remesh_attempts']}"
                    if r and "remesh_failures" in r else "-")
        lines.append(
            f"| {o} | {init_h} | {pf if pf is not None else '-'} "
            f"| {af if af is not None else '-'} "
            f"| {delta if delta is not None else '-'} "
            f"| {'yes' if delta is not None and delta > 0 else ('NO' if delta is not None else '-')} "
            f"| {fails(p)} | {fails(a)} |")
        rows_out.append({"object": o, "init_hausdorff_mean": init_h,
                         "parity_final": pf, "advanced_final": af,
                         "delta": delta})
    lines += ["",
              f"{n_adv_wins}/{n_both} objects with both rows: the advanced "
              "stack beats parity."]

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    json.dump(rows_out, open(args.out + ".json", "w"), indent=1)
    with open(args.out + ".md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
