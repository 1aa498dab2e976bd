#!/bin/bash
# Round-5 optional tail (run after r5c if wall-clock remains): the 8-object
# quick suite under the shipped coarsen_policy=auto CLI/suite default —
# validates the auto default at the resolution regime where it matters
# (quick = quarter res -> auto resolves to "skip").
set -o pipefail
cd /root/repo || exit 1
mkdir -p results_r5/quick_auto reports

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

Q="--quick --views 24 --passes 16 --iters 200 --init carved --start-len 4 \
   --optimizer sgd --precond none --lr 0.1 --resume \
   --out-dir results_r5/quick_auto"
for obj in hand mouse dog monkey horse pig rabbit tiger; do
  if run_retry 7200 2 python scripts/run_suite.py $Q --objects $obj \
       2>&1 | tee -a results_r5/quick_auto/$obj.log; then
    python scripts/aggregate_suite.py results_r5/quick_auto \
      --out reports/suite_r5_8obj_quick_auto
    git add -A reports 2>/dev/null
    git diff --cached --quiet || \
      git commit -q -m "Quick suite under the auto coarsen default: $obj"
  else
    echo "FAILED quick $obj"
  fi
done
echo "R5D AGENDA COMPLETE $(date +%T)"
