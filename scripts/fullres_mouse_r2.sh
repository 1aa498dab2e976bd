#!/bin/bash
# Round-2: does the optimizer make progress at reference scale (full-res
# mouse, 72 views, carved init) now that the remesher preserves surface?
set -x
cd /root/repo
mkdir -p results_r2/full_mouse_parity/capture_cache results_r2/full_mouse_sobolev/capture_cache

timeout 7200 python scripts/run_suite.py --objects mouse --views 72 \
  --passes 10 --iters 200 --init carved --optimizer sgd --precond none \
  --lr 0.1 --out-dir results_r2/full_mouse_parity \
  > results_r2/full_mouse_parity/log.txt 2>&1
echo "=== parity rc=$?"
python -c "import json;r=json.load(open('results_r2/full_mouse_parity/suite_report.json'));print(json.dumps(r[-1]))" 2>/dev/null

# reuse capture + carve caches
cp -n results_r2/full_mouse_parity/capture_cache/*.npz results_r2/full_mouse_sobolev/capture_cache/ 2>/dev/null

timeout 7200 python scripts/run_suite.py --objects mouse --views 72 \
  --passes 10 --iters 200 --init carved --optimizer uadam --precond sobolev \
  --lr 0.03 --rvpi 2 --out-dir results_r2/full_mouse_sobolev \
  > results_r2/full_mouse_sobolev/log.txt 2>&1
echo "=== sobolev rc=$?"
python -c "import json;r=json.load(open('results_r2/full_mouse_sobolev/suite_report.json'));print(json.dumps(r[-1]))" 2>/dev/null
