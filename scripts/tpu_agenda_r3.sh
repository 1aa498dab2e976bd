#!/bin/bash
# Round-2 agenda, take 2: resilient to axon-tunnel drops (the 06:53 hand
# death was a silent tunnel hang, not a code failure). Each step waits for
# TPU health and retries with --resume so completed passes are never lost.
# Prereqs fixed since take 1: carve slab bug (pig), VMEM-resident miscount.
cd /root/repo
mkdir -p results_r2/fullres reports

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

Q="--quick --views 24 --passes 16 --iters 200 --init carved --start-len 4 \
   --optimizer sgd --precond none --lr 0.1 --resume"

# 1. pig (carve fixed; capture + fixed hull cached)
run_retry 7200 4 python scripts/run_suite.py $Q --objects pig \
  --out-dir results_r2/long16_pig 2>&1 | tee -a results_r2/long16_pig.log

# 2. full-res hand 20x200 (VERDICT item 1 full-res bar; caches present)
run_retry 10800 5 python scripts/run_suite.py --objects hand --views 72 \
  --passes 20 --iters 200 --init carved --start-len 4 \
  --optimizer sgd --precond none --lr 0.1 --resume \
  --out-dir results_r2/fullres 2>&1 | tee -a results_r2/fullres/hand.log

# 3. remaining 6 objects at the proven quick config (VERDICT item 9 table)
for obj in hand horse rabbit tiger dog monkey; do
  run_retry 10800 4 python scripts/run_suite.py $Q --objects $obj \
    --out-dir results_r2/long16_$obj 2>&1 | tee -a results_r2/long16_$obj.log
done

# 4. aggregate the 8-object table (mouse+pig from step 1 / earlier run)
python scripts/aggregate_suite.py \
  results_r2/long16_{mouse,pig,hand,horse,rabbit,tiger,dog,monkey} \
  --out reports/suite_r2_8obj

# 5. A/B: uadam+h1 with len-tracking lr, long schedule (understanding)
mkdir -p results_r2/long16_uadam_len/capture_cache
cp -n results_r2/long16_mouse/capture_cache/*.npz \
  results_r2/long16_uadam_len/capture_cache/ 2>/dev/null
run_retry 7200 2 python scripts/run_suite.py --quick --objects mouse \
  --views 24 --passes 16 --iters 200 --init carved --start-len 4 \
  --optimizer uadam --precond h1 --lam 29 --lr 0.1 --lr-schedule len \
  --resume --out-dir results_r2/long16_uadam_len \
  2>&1 | tee -a results_r2/long16_uadam_len.log

# 6. full-res mouse 20x200 (second full-res datapoint)
run_retry 10800 3 python scripts/run_suite.py --objects mouse --views 72 \
  --passes 20 --iters 200 --init carved --start-len 4 \
  --optimizer sgd --precond none --lr 0.1 --resume \
  --out-dir results_r2/fullres 2>&1 | tee -a results_r2/fullres/mouse.log

# 7. kernel tile-size sweep (perf follow-up; chip already warm)
run_retry 3600 2 python scripts/tune_kernel.py \
  --out reports/kernel_tuning.json 2>&1 | tee results_r2/tune_kernel.log

# 8. re-validate bench end-to-end (incl. the new supersampled tiger config)
run_retry 4800 2 python bench.py 2>&1 | tee results_r2/bench_r2b.log

echo "AGENDA COMPLETE $(date +%T)"
