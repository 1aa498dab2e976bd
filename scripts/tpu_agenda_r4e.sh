#!/bin/bash
# Round-4 agenda part E: what remains after r4c/r4d — the fixed h5 e2e and
# the rest of the full-res suite (dog committed; monkey resumable).
cd /root/repo
mkdir -p results_r4 reports

wait_tpu() {
  until timeout 300 python -c "
import jax, jax.numpy as jnp
jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128))).block_until_ready()
print('TPU OK')" 2>/dev/null; do
    echo "$(date +%T) tpu not ready; sleeping 120s"; sleep 120
  done
}

run_retry() {
  local to=$1 n=$2; shift 2
  for i in $(seq 1 "$n"); do
    wait_tpu
    timeout "$to" "$@" && return 0
    echo "$(date +%T) attempt $i failed (rc=$?): $*"; sleep 30
  done
  return 1
}

commit_reports() {
  git add -A reports results_r4 BENCH_DETAIL.json 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1"
}

# --- 1. h5 end-to-end (hardened script) ------------------------------------
run_retry 10800 2 python scripts/h5_e2e.py --out-dir results_r4/h5 \
  2>&1 | tee -a results_r4/h5_e2e.log
commit_reports "Real-schema h5 end-to-end rows (mouse Pointgray, tiger Redmi)"

# --- 2. full-res parity suite (dog done; resume the rest) ------------------
FR="--views 72 --passes 20 --iters 200 --init carved --start-len 4 \
    --optimizer sgd --precond none --lr 0.1 --resume \
    --out-dir results_r4/fullres"
for obj in monkey hand mouse pig tiger horse rabbit; do
  run_retry 14400 3 python scripts/run_suite.py $FR --objects $obj \
    2>&1 | tee -a results_r4/fullres/$obj.log
  python scripts/aggregate_suite.py results_r4/fullres \
    --out reports/suite_r4_8obj_fullres
  commit_reports "Full-res suite r4: $obj (remesh-health counters)"
done
echo "R4E AGENDA COMPLETE $(date +%T)"
