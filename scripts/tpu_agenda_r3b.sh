#!/bin/bash
# Round-2 agenda, take 3: the full 8-object suite AT CAPTURE RESOLUTION
# (VERDICT round-1 item 9 asks for capture res, not the quick quarter-res).
# Feasibility: full-res hand 20x200 completed in 34 min (BASELINE.md round-2
# results); Redmi objects are ~1.7x the rays. Ordered cheapest-proven first
# so a timeout leaves the most complete table. Every step waits for TPU
# health and retries with --resume, so completed passes are never lost.
cd /root/repo
mkdir -p results_r3/fullres reports

wait_tpu() {
  until timeout 300 python -c "
import jax, jax.numpy as jnp
jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128))).block_until_ready()
print('TPU OK')" 2>/dev/null; do
    echo "$(date +%T) tpu not ready; sleeping 180s"; sleep 180
  done
}

# run_retry <timeout_s> <attempts> <cmd...>
run_retry() {
  local to=$1 n=$2; shift 2
  for i in $(seq 1 "$n"); do
    wait_tpu
    timeout "$to" "$@" && return 0
    echo "$(date +%T) attempt $i failed (rc=$?): $*"; sleep 60
  done
  return 1
}

FR="--views 72 --passes 20 --iters 200 --init carved --start-len 4 \
    --optimizer sgd --precond none --lr 0.1 --resume \
    --out-dir results_r3/fullres"

# 1. full-res suite, one invocation per object (isolates failures; the
#    suite_report.json skip-done logic makes retries cheap)
for obj in hand mouse pig horse rabbit tiger dog monkey; do
  run_retry 14400 3 python scripts/run_suite.py $FR --objects $obj \
    2>&1 | tee -a results_r3/fullres/$obj.log
  python scripts/aggregate_suite.py results_r3/fullres \
    --out reports/suite_r2_8obj_fullres
done

# 2. kernel tile-size sweep (perf follow-up; chip already warm)
run_retry 3600 2 python scripts/tune_kernel.py \
  --out reports/kernel_tuning.json 2>&1 | tee results_r3/tune_kernel.log

# 3. re-validate bench end-to-end (incl. the supersampled tiger config)
run_retry 4800 2 python bench.py 2>&1 | tee results_r3/bench_r2c.log

echo "AGENDA COMPLETE $(date +%T)"
