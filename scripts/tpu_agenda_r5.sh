#!/bin/bash
# Round-5 agenda: finish the full-res suite (rows already committed in
# reports/suite_r4_8obj_fullres.json are skipped via seeding — the results
# dir does NOT survive across sessions, only the committed report does),
# then the deferred perf follow-ups.
cd /root/repo
mkdir -p results_r5/fullres reports

# Seed: committed rows -> suite_report.json so run_suite skips done objects
# and aggregate keeps every row.
python - <<'EOF'
import json, os
src = "reports/suite_r4_8obj_fullres.json"
dst = "results_r5/fullres/suite_report.json"
if os.path.exists(src) and not os.path.exists(dst):
    rows = json.load(open(src))
    for r in rows:
        r.pop("run_dir", None)
    json.dump(rows, open(dst, "w"), indent=1)
    print("seeded", [r["object"] for r in rows])
EOF

wait_tpu() {
  until timeout 300 python -c "
import jax, jax.numpy as jnp
jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128))).block_until_ready()
print('TPU OK')" 2>/dev/null; do
    echo "$(date +%T) tpu not ready; sleeping 60s"; sleep 60
  done
}

run_retry() {
  local to=$1 n=$2; shift 2
  for i in $(seq 1 "$n"); do
    wait_tpu
    timeout "$to" "$@" && return 0
    echo "$(date +%T) attempt $i failed (rc=$?): $*"; sleep 20
  done
  return 1
}

commit_reports() {
  git add -A reports results_r5/fullres/suite_report.json BENCH_DETAIL.json \
    2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1"
}

# --- 1. remaining full-res objects (fastest first) --------------------------
FR="--views 72 --passes 20 --iters 200 --init carved --start-len 4 \
    --optimizer sgd --precond none --lr 0.1 --resume \
    --out-dir results_r5/fullres"
for obj in mouse tiger horse rabbit pig; do
  run_retry 14400 3 python scripts/run_suite.py $FR --objects $obj \
    2>&1 | tee -a results_r5/fullres/$obj.log
  python scripts/aggregate_suite.py results_r5/fullres \
    --out reports/suite_r4_8obj_fullres
  commit_reports "Full-res suite: $obj (remesh-health counters)"
done

# --- 2. fwd-only kernel-table re-rank with the [N,9]-gather chain -----------
run_retry 7200 2 python scripts/tune_kernel.py --fwd-only \
  --out reports/kernel_tuning.json 2>&1 | tee results_r5/tune_fwd.log
run_retry 3600 2 python bench.py 2>&1 | tee results_r5/bench.log
commit_reports "Re-rank kernel table by the rewritten forward chain; re-bench"

# --- 3. quick suite 8/8 under the shipped coarsen_policy=auto default -------
Q="--quick --views 24 --passes 16 --iters 200 --init carved --start-len 4 \
   --optimizer sgd --precond none --lr 0.1 --resume \
   --out-dir results_r5/quick_auto"
for obj in hand mouse dog monkey horse pig rabbit tiger; do
  run_retry 7200 2 python scripts/run_suite.py $Q --objects $obj \
    2>&1 | tee -a results_r5/quick_auto/$obj.log
  python scripts/aggregate_suite.py results_r5/quick_auto \
    --out reports/suite_r5_8obj_quick_auto
  git add -A reports results_r5/quick_auto/suite_report.json 2>/dev/null
  git diff --cached --quiet || \
    git commit -q -m "Quick suite under the auto coarsen default: $obj"
done
echo "R5 AGENDA COMPLETE $(date +%T)"
