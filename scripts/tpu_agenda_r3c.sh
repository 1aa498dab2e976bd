#!/bin/bash
# Round-2 agenda, take 4: the 8-object suite at the PROVEN quick config
# (16x200, 24 views, carved init, parity SGD) — the full-res variant
# (tpu_agenda_r3b.sh) needs ~5h; this fits the session and yields the
# 8-row VERDICT item-9 table. Aggregates into git-tracked reports/ after
# every object so a timeout loses nothing. mouse/pig ran under this exact
# config in round 2 (BASELINE.md) but their result dirs were cleaned, so
# they are re-run last; never-run objects go first.
cd /root/repo
mkdir -p results_r3/quick reports

wait_tpu() {
  until timeout 300 python -c "
import jax, jax.numpy as jnp
jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128))).block_until_ready()
print('TPU OK')" 2>/dev/null; do
    echo "$(date +%T) tpu not ready; sleeping 120s"; sleep 120
  done
}

# run_retry <timeout_s> <attempts> <cmd...>
run_retry() {
  local to=$1 n=$2; shift 2
  for i in $(seq 1 "$n"); do
    wait_tpu
    timeout "$to" "$@" && return 0
    echo "$(date +%T) attempt $i failed (rc=$?): $*"; sleep 30
  done
  return 1
}

Q="--quick --views 24 --passes 16 --iters 200 --init carved --start-len 4 \
   --optimizer sgd --precond none --lr 0.1 --resume \
   --out-dir results_r3/quick"

for obj in hand horse rabbit tiger pig mouse dog monkey; do
  run_retry 5400 3 python scripts/run_suite.py $Q --objects $obj \
    2>&1 | tee -a results_r3/quick/$obj.log
  python scripts/aggregate_suite.py results_r3/quick \
    --out reports/suite_r2_8obj_quick
done

echo "AGENDA COMPLETE $(date +%T)"
