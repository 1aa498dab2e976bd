#!/bin/bash
# Post-bf16-fix full-resolution reconstruction runs (VERDICT item 1 bar:
# full-res hand must beat its init). Carved (self-consistent) init,
# reference-parity dynamics. Run AFTER the TPU is free.
set -x
cd /root/repo
OUT=results_r2/fullres
mkdir -p $OUT
timeout 10800 python scripts/run_suite.py --objects hand --views 72 \
  --passes "${PASSES:-10}" --iters 200 --init carved --start-len 4 \
  --optimizer "${OPT:-sgd}" --precond "${PRE:-none}" --lr "${LR:-0.1}" \
  --lr-schedule "${LRS:-reciprocal}" \
  --out-dir $OUT 2>&1 | tee -a $OUT/hand.log
timeout 10800 python scripts/run_suite.py --objects mouse --views 72 \
  --passes "${PASSES:-10}" --iters 200 --init carved --start-len 4 \
  --optimizer "${OPT:-sgd}" --precond "${PRE:-none}" --lr "${LR:-0.1}" \
  --lr-schedule "${LRS:-reciprocal}" \
  --out-dir $OUT 2>&1 | tee -a $OUT/mouse.log
