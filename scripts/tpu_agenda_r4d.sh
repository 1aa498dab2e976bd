#!/bin/bash
# Round-4 agenda part D: the reconstruction stages (h5 e2e, quality
# experiments, full-res suite). Split from r4c so the fwd profile + any
# chain optimization could run on an idle chip between bench and the long
# reconstructions. Never kills by pattern; artifacts committed per stage.
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

# --- 1. h5 end-to-end ------------------------------------------------------
run_retry 7200 2 python scripts/h5_e2e.py --out-dir results_r4/h5 \
  2>&1 | tee -a results_r4/h5_e2e.log
commit_reports "Real-schema h5 end-to-end rows (mouse Pointgray, tiger Redmi)"

# --- 2. quality experiments ------------------------------------------------
for obj in hand dog; do
  run_retry 5400 2 python scripts/run_suite.py --quick --views 24 \
    --passes 16 --iters 200 --init carved --start-len 4 \
    --optimizer sgd --precond none --lr 0.1 --coarsen-policy skip --resume \
    --out-dir results_r4/policy_skip --objects $obj \
    2>&1 | tee -a results_r4/policy_skip/$obj.log
done
python scripts/aggregate_suite.py results_r4/policy_skip \
  --out reports/suite_r4_policy_skip
commit_reports "Quality experiment: coarsen_policy=skip on hand+dog quick"

run_retry 10800 2 python scripts/run_suite.py --views 24 --res-div 2 \
  --passes 16 --iters 200 --init carved --start-len 4 \
  --optimizer sgd --precond none --lr 0.1 --resume \
  --out-dir results_r4/res_ablation --objects hand \
  2>&1 | tee -a results_r4/res_ablation/hand.log
python scripts/aggregate_suite.py results_r4/res_ablation \
  --out reports/suite_r4_res_ablation
commit_reports "Resolution ablation: hand at 480x640 (regression-floor probe)"

run_retry 10800 2 python scripts/run_suite.py --views 72 \
  --passes 20 --iters 200 --init carved --start-len 4 \
  --optimizer uadam --precond h1 --lr 0.1 --lr-schedule len --resume \
  --out-dir results_r4/adv_fullres --objects hand \
  2>&1 | tee -a results_r4/adv_fullres/hand.log
python scripts/aggregate_suite.py results_r4/adv_fullres \
  --out reports/suite_r4_adv_fullres
commit_reports "Advanced stack (h1+uadam+len) at full res: hand"

# --- 3. full-res parity suite with remesh-health counters ------------------
FR="--views 72 --passes 20 --iters 200 --init carved --start-len 4 \
    --optimizer sgd --precond none --lr 0.1 --resume \
    --out-dir results_r4/fullres"
for obj in dog monkey hand mouse pig tiger horse rabbit; do
  run_retry 14400 3 python scripts/run_suite.py $FR --objects $obj \
    2>&1 | tee -a results_r4/fullres/$obj.log
  python scripts/aggregate_suite.py results_r4/fullres \
    --out reports/suite_r4_8obj_fullres
  commit_reports "Full-res suite r4: $obj (remesh-health counters)"
done
echo "R4D AGENDA COMPLETE $(date +%T)"
