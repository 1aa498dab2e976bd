#!/bin/bash
# Post-precision-fix A/B: parity SGD vs evidence-H1, fresh captures+carves.
set -x
cd /root/repo
run() {
  out=results_r2/fixed_$1; shift
  mkdir -p $out/capture_cache
  # share the regenerated capture + carve across configs
  cp -n results_r2/fixed_parity/capture_cache/*.npz $out/capture_cache/ 2>/dev/null
  timeout 3000 python scripts/run_suite.py --quick --objects mouse --views 24 \
    --passes 4 --iters 100 --init carved "$@" --out-dir $out
  echo "=== $out rc=$?"
  python -c "import json;r=json.load(open('$out/suite_report.json'));print(json.dumps(r[-1]))" 2>/dev/null
}
run parity --optimizer sgd --precond none --lr 0.1
run h1_lr03 --optimizer sgd --precond h1 --lam 9 --lr 0.03 --rvpi 2
run h1_lr01 --optimizer sgd --precond h1 --lam 9 --lr 0.1 --rvpi 2
