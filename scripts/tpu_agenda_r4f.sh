#!/bin/bash
# Round-4 agenda part F: finish the full-res suite (hand/dog/monkey rows are
# committed; results_r4/fullres/suite_report.json is seeded with them so
# run_suite skips those objects and aggregate keeps every row). Objects are
# ordered fastest-first so a wall-clock cutoff still lands complete rows.
cd /root/repo
mkdir -p results_r4/fullres reports

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
  git add -A reports results_r4/fullres/suite_report.json 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1"
}

FR="--views 72 --passes 20 --iters 200 --init carved --start-len 4 \
    --optimizer sgd --precond none --lr 0.1 --resume \
    --out-dir results_r4/fullres"
for obj in mouse tiger horse rabbit pig; do
  run_retry 14400 3 python scripts/run_suite.py $FR --objects $obj \
    2>&1 | tee -a results_r4/fullres/$obj.log
  python scripts/aggregate_suite.py results_r4/fullres \
    --out reports/suite_r4_8obj_fullres
  commit_reports "Full-res suite r4: $obj (remesh-health counters)"
done
echo "R4F AGENDA COMPLETE $(date +%T)"
