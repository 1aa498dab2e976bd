#!/bin/bash
# Round-3 agenda (replaces the r3c chain, whose fullres leg was killed):
#  1. re-run dog/pig/monkey quick post-remesh-fix (their pre-fix rows ran
#     with a 100%-failing remesher — VERDICT round-2 weak #1, fixed in
#     commit 6c5ad55); their carve caches hold pillow-corrupt inits, so
#     those are regenerated too.
#  2. policy experiments (VERDICT items 5+6): --no-coarsen and
#     uadam+h1+lr_schedule=len vs the parity rows, hand+mouse quick.
#  3. tiger ss4 memory check, gated on the chunked-step work landing.
#  4. full-resolution 8-object suite in value order: dog/monkey (never run
#     at capture res) right after the two cheap proven objects.
#  5. kernel sweep (now records padded face counts) + final bench.
# Every step waits for TPU health and resumes from checkpoints, so a
# timeout or tunnel blip loses at most one pass.
cd /root/repo
mkdir -p results_r3/quick results_r3/fullres reports

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

# --- 1. post-fix quick re-runs --------------------------------------------
python - <<'PY'
import json
p = "results_r3/quick/suite_report.json"
rows = json.load(open(p))
rows = [r for r in rows if r["object"] not in ("dog", "pig", "monkey")]
json.dump(rows, open(p, "w"), indent=1)
PY
for o in dog pig monkey; do
  rm -rf results_r3/quick/checkpoints/$o \
         results_r3/quick/${o}_metrics.jsonl \
         results_r3/quick/${o}_recons.ply \
         results_r3/quick/capture_cache/${o}_*hull160.npz
done

Q="--quick --views 24 --passes 16 --iters 200 --init carved --start-len 4 \
   --optimizer sgd --precond none --lr 0.1 --resume \
   --out-dir results_r3/quick"
for obj in dog pig monkey; do
  run_retry 5400 3 python scripts/run_suite.py $Q --objects $obj \
    2>&1 | tee -a results_r3/quick/${obj}_postfix.log
  python scripts/aggregate_suite.py results_r3/quick \
    --out reports/suite_r3_8obj_quick
done

# --- 2. policy experiments -------------------------------------------------
for d in policy_nc policy_adv; do
  mkdir -p results_r3/$d/capture_cache
  cp results_r3/quick/capture_cache/hand_24v_240x320*.npz \
     results_r3/quick/capture_cache/mouse_24v_240x320*.npz \
     results_r3/$d/capture_cache/ 2>/dev/null
done
for obj in hand mouse; do
  run_retry 5400 2 python scripts/run_suite.py --quick --views 24 \
    --passes 16 --iters 200 --init carved --start-len 4 \
    --optimizer sgd --precond none --lr 0.1 --no-coarsen --resume \
    --out-dir results_r3/policy_nc --objects $obj \
    2>&1 | tee -a results_r3/policy_nc/$obj.log
  run_retry 5400 2 python scripts/run_suite.py --quick --views 24 \
    --passes 16 --iters 200 --init carved --start-len 4 \
    --optimizer uadam --precond h1 --lr 0.1 --lr-schedule len --resume \
    --out-dir results_r3/policy_adv --objects $obj \
    2>&1 | tee -a results_r3/policy_adv/$obj.log
done
python scripts/aggregate_suite.py results_r3/policy_nc \
  --out reports/suite_r3_policy_nc
python scripts/aggregate_suite.py results_r3/policy_adv \
  --out reports/suite_r3_policy_adv

# --- 3. tiger ss4 (gated on the chunked differentiable step landing) -------
if [ -f scripts/check_tiger_ss4.py ]; then
  run_retry 3600 2 python scripts/check_tiger_ss4.py \
    2>&1 | tee results_r3/tiger_ss4.log
fi

# --- 4. full-resolution suite, value order ----------------------------------
FR="--views 72 --passes 20 --iters 200 --init carved --start-len 4 \
    --optimizer sgd --precond none --lr 0.1 --resume \
    --out-dir results_r3/fullres"
for obj in hand mouse dog monkey pig horse rabbit tiger; do
  run_retry 14400 3 python scripts/run_suite.py $FR --objects $obj \
    2>&1 | tee -a results_r3/fullres/$obj.log
  python scripts/aggregate_suite.py results_r3/fullres \
    --out reports/suite_r3_8obj_fullres
done

# --- 5. kernel sweep + final bench ------------------------------------------
run_retry 5400 2 python scripts/tune_kernel.py \
  --out reports/kernel_tuning.json 2>&1 | tee results_r3/tune_kernel_r4.log
run_retry 4800 2 python bench.py 2>&1 | tee results_r3/bench_r4.log
echo "R4 AGENDA COMPLETE $(date +%T)"
