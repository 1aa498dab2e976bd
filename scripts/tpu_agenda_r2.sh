#!/bin/bash
# Round-2 TPU agenda, in priority order, for when the axon tunnel returns.
# Key round-2 finding (results_r2/fixed_start4_parity_8x200): parity
# SGD descends MONOTONICALLY across 200-iter passes (1.888 -> 1.556 by pass
# 5, crossing below the 1.5596 carved init) — the earlier quick suite
# regressions were schedule-starvation (4x100). Run the reference's real
# schedule length.
set -x
cd /root/repo
mkdir -p results_r2/fullres

# 0. fail fast if the tunnel is still down
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

# 1. bench validation (VERDICT item 4: the driver runs bench.py at round
#    end — the large-mesh/full-view configs must not crash). Includes the
#    prepass/fwd/bwd per-stage breakdown now.
timeout 3600 python bench.py > results_r2/bench_r2_validate.log 2>&1
tail -1 results_r2/bench_r2_validate.log

# 2. quick-res mouse + pig at the real schedule: 16 passes x 200 iters,
#    parity dynamics (the proven-descending config)
for obj in mouse pig; do
  mkdir -p results_r2/long16_$obj/capture_cache
  cp results_r2/fixed_parity/capture_cache/*.npz \
     results_r2/fixed_start4_parity_pig/capture_cache/pig_*.npz \
     results_r2/long16_$obj/capture_cache/ 2>/dev/null
  timeout 7200 python scripts/run_suite.py --quick --objects $obj --views 24 \
    --passes 16 --iters 200 --init carved --start-len 4 \
    --optimizer sgd --precond none --lr 0.1 \
    --out-dir results_r2/long16_$obj 2>&1 | tee results_r2/long16_$obj.log
done

# 3. full-res hand, 20x200, carved init (the VERDICT full-res bar: beat 2.20)
PASSES=20 bash scripts/fullres_r2.sh

# 4. the remaining 6 objects at the same proven quick-res config (VERDICT
#    item 9's 8-row table = these + the two long16 runs above). dog/monkey
#    (145k/184k faces) exercise the HBM-streaming kernel in a real run for
#    the first time.
for obj in hand horse rabbit tiger dog monkey; do
  mkdir -p results_r2/long16_$obj
  timeout 10800 python scripts/run_suite.py --quick --objects $obj --views 24 \
    --passes 16 --iters 200 --init carved --start-len 4 \
    --optimizer sgd --precond none --lr 0.1 \
    --out-dir results_r2/long16_$obj 2>&1 | tee results_r2/long16_$obj.log
done

# 5. A/B: uadam+h1 with len-tracking lr at the same long schedule
mkdir -p results_r2/long16_uadam_len/capture_cache
cp results_r2/fixed_parity/capture_cache/*.npz results_r2/long16_uadam_len/capture_cache/ 2>/dev/null
timeout 7200 python scripts/run_suite.py --quick --objects mouse --views 24 \
  --passes 16 --iters 200 --init carved --start-len 4 \
  --optimizer uadam --precond h1 --lam 29 --lr 0.1 --lr-schedule len \
  --out-dir results_r2/long16_uadam_len 2>&1 | tee results_r2/long16_uadam_len.log

# 6. aggregate the 8-object table into reports/ (VERDICT item 9 deliverable)
python scripts/aggregate_suite.py \
  results_r2/long16_{mouse,pig,hand,horse,rabbit,tiger,dog,monkey} \
  --out reports/suite_r2_8obj

# 7. probes (understanding, lower priority now)
timeout 2400 python scripts/exp_parity_drift.py > results_r2/exp_parity_drift.log 2>&1
timeout 3600 python scripts/exp_coarse.py > results_r2/exp_coarse_tpu.log 2>&1
