#!/bin/bash
# wait for any running suite, then re-run configs A and B (post-carve-fix)
set -x
cd /root/repo
while pgrep -f "run_suite.py" > /dev/null; do sleep 20; done
for cfg in "A_sobolev_uadam_lr0.1 uadam sobolev 0.1" \
           "B_sobolev_uadam_lr0.03 uadam sobolev 0.03"; do
  set -- $cfg
  out=results_r2/quick_$1
  mkdir -p $out/capture_cache
  cp -n result_suite/capture_cache/mouse_24v_240x320.npz $out/capture_cache/ 2>/dev/null
  cp -n results_r2/quick_C_parity_sgd_carved/capture_cache/mouse_24v_240x320_hull160.npz $out/capture_cache/ 2>/dev/null
  timeout 2400 python scripts/run_suite.py --quick --objects mouse \
    --views 24 --passes 4 --iters 100 --init carved \
    --optimizer $2 --precond $3 --lr $4 --out-dir $out \
    > $out/log.txt 2>&1
  echo "=== $1 rc=$?"
done
