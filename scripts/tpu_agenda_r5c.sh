#!/bin/bash
# Round-5 perf agenda — runs AFTER tpu_agenda_r5b.sh frees the chip:
#   1. resort A/B (incoherent-query strategy) -> reports/resort_ab.json
#      (committing the report IS the rollout: api._auto_incoherent reads it)
#   2. fwd-only kernel-table re-rank on the rewritten chain (VERDICT item 3)
#   3. bench.py with the tuned table + the measured incoherent strategy
#   4. single-chip shard_map overhead (VERDICT stretch item 10)
set -o pipefail
cd /root/repo || exit 1
mkdir -p results_r5 reports

wait_tpu() {
  until timeout 300 python -c "
import jax, jax.numpy as jnp
jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128))).block_until_ready()
print('TPU OK')" 2>/dev/null; do
    echo "$(date +%T) tpu not ready; sleeping 60s"; sleep 60
  done
}

run_retry() {
  local to=$1 n=$2 rc i; shift 2
  for i in $(seq 1 "$n"); do
    wait_tpu
    timeout "$to" "$@"
    rc=$?
    [ "$rc" -eq 0 ] && return 0
    echo "$(date +%T) attempt $i failed (rc=$rc): $*"; sleep 20
  done
  return 1
}

commit_reports() {
  git add -A reports BENCH_DETAIL.json 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1"
}

if run_retry 7200 2 python scripts/resort_ab.py \
     2>&1 | tee results_r5/resort_ab.log; then
  commit_reports "Incoherent-query A/B: Morton resort vs per-ray prepass (auto picks winner per regime)"
else
  echo "FAILED resort_ab"
fi

if run_retry 10800 2 python scripts/tune_kernel.py --fwd-only \
     --out reports/kernel_tuning.json 2>&1 | tee results_r5/tune_fwd.log; then
  commit_reports "Kernel table re-ranked by the rewritten forward chain (fwd-only)"
else
  echo "FAILED tune_kernel"
fi

if run_retry 5400 2 python bench.py 2>&1 | tee results_r5/bench_r5.log; then
  commit_reports "Round-5 bench: tuned table + measured incoherent strategy"
else
  echo "FAILED bench"
fi

if run_retry 3600 2 python scripts/shardmap_overhead.py \
     2>&1 | tee results_r5/shardmap_overhead.log; then
  commit_reports "Single-chip shard_map overhead measurement (1-device mesh vs plain step)"
else
  echo "FAILED shardmap_overhead"
fi
echo "R5C AGENDA COMPLETE $(date +%T)"
