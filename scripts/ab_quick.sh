#!/bin/bash
# Round-2 quick A/B: does the new recipe improve Hausdorff vs init?
# Sequential runs (one TPU chip). Each ~6-10 min.
set -x
cd /root/repo
for cfg in "A_sobolev_uadam_lr0.1 uadam sobolev 0.1" \
           "B_sobolev_uadam_lr0.03 uadam sobolev 0.03" \
           "C_parity_sgd_carved sgd none 0.1"; do
  set -- $cfg
  out=results_r2/quick_$1
  mkdir -p $out/capture_cache
  cp -n result_suite/capture_cache/mouse_24v_240x320.npz $out/capture_cache/ 2>/dev/null
  timeout 2400 python scripts/run_suite.py --quick --objects mouse \
    --views 24 --passes 4 --iters 100 --init carved \
    --optimizer $2 --precond $3 --lr $4 --out-dir $out \
    > $out/log.txt 2>&1
  echo "=== $1 rc=$?"
  tail -1 $out/suite_report.json 2>/dev/null
  python -c "import json;r=json.load(open('$out/suite_report.json'));print(json.dumps(r[-1]))" 2>/dev/null
done
