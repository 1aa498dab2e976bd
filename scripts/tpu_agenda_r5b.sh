#!/bin/bash
# Round-5 main agenda (VERDICT r4 item 1 + 7):
#   1. pig full-res parity -> 8/8 objects in the parity suite
#   2. advanced stack (h1+uadam+len) at full res on the remaining 7 objects
#   3. one full-res h5-schema end-to-end row (mouse, 72 views, capture res)
# Results dirs do not survive sessions; committed reports are seeded back in
# so finished objects are skipped and aggregate keeps every row.
# ADVICE r4 fixes: pipefail, rc captured before logging, aggregate/commit
# guarded on run_retry success, no blanket BENCH_DETAIL.json adds.
set -o pipefail
cd /root/repo || exit 1
mkdir -p results_r5/fullres results_r5/adv_fullres reports

python - <<'EOF'
import json, os
for src, dst in [
    ("reports/suite_r4_8obj_fullres.json", "results_r5/fullres/suite_report.json"),
    ("reports/suite_r4_adv_fullres.json", "results_r5/adv_fullres/suite_report.json"),
]:
    if os.path.exists(src) and not os.path.exists(dst):
        rows = json.load(open(src))
        for r in rows:
            r.pop("run_dir", None)
        json.dump(rows, open(dst, "w"), indent=1)
        print("seeded", dst, [r["object"] for r in rows])
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
  git add -A reports 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1"
}

# --- 1. pig: the last parity object ----------------------------------------
FR="--views 72 --passes 20 --iters 200 --init carved --start-len 4 \
    --optimizer sgd --precond none --lr 0.1 --resume \
    --out-dir results_r5/fullres"
if run_retry 14400 3 python scripts/run_suite.py $FR --objects pig \
     2>&1 | tee -a results_r5/fullres/pig.log; then
  python scripts/aggregate_suite.py results_r5/fullres \
    --out reports/suite_r5_8obj_fullres
  commit_reports "Full-res parity suite 8/8: pig"
else
  echo "FAILED pig parity"
fi

# --- 2. advanced stack (h1+uadam+len) on the 7 objects without a row --------
ADV="--views 72 --passes 20 --iters 200 --init carved --start-len 4 \
     --optimizer uadam --precond h1 --lr 0.1 --lr-schedule len --resume \
     --out-dir results_r5/adv_fullres"
for obj in mouse monkey dog horse rabbit tiger pig; do
  if run_retry 14400 3 python scripts/run_suite.py $ADV --objects $obj \
       2>&1 | tee -a results_r5/adv_fullres/$obj.log; then
    python scripts/aggregate_suite.py results_r5/adv_fullres \
      --out reports/suite_r5_adv_fullres
    commit_reports "Advanced stack (h1+uadam+len) full res: $obj"
  else
    echo "FAILED adv $obj"
  fi
done

# --- 3. full-res h5-schema end-to-end row (VERDICT r4 item 7) ---------------
if run_retry 14400 2 python scripts/h5_e2e.py --objects mouse --views 72 \
     --res-div 1 --passes 20 --iters 200 --timeout 14400 \
     --out-dir results_r5/h5_fullres --report reports/h5_e2e_r5.json \
     2>&1 | tee -a results_r5/h5_fullres.log; then
  commit_reports "Full-res h5-schema e2e row: mouse, 72 views, capture res"
else
  echo "FAILED h5 fullres"
fi
echo "R5B AGENDA COMPLETE $(date +%T)"
