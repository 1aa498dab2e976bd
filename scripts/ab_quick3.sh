#!/bin/bash
# Ablation: loss-term balance at quick scale (sobolev+uadam, carved init)
set -x
cd /root/repo
run() {  # name extra-args...
  out=results_r2/quick_$1; shift
  mkdir -p $out/capture_cache
  cp -n result_suite/capture_cache/mouse_24v_240x320.npz $out/capture_cache/ 2>/dev/null
  cp -n results_r2/quick_C_parity_sgd_carved/capture_cache/mouse_24v_240x320_hull160.npz $out/capture_cache/ 2>/dev/null
  timeout 2400 python scripts/run_suite.py --quick --objects mouse \
    --views 24 --passes 4 --iters 100 --init carved \
    --optimizer uadam --precond sobolev --lr 0.03 --rvpi 4 \
    "$@" --out-dir $out > $out/log.txt 2>&1
  echo "=== $1 rc=$?"
  python -c "import json;r=json.load(open('$out/suite_report.json'));print(json.dumps(r[-1]))" 2>/dev/null
}
run D_rayonly --sm-w 0 --vh-w 0
run E_smdown --sm-w 0.008
run F_novh --vh-w 0
