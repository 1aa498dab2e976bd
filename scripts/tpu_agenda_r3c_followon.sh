#!/bin/bash
# Follow-on to tpu_agenda_r3c.sh: waits for the suite agenda to finish,
# then runs the kernel tile-size sweep (perf follow-up from NOTES_ROUND2)
# and a final bench validation. Runs detached so the TPU keeps working
# after the interactive session's turns are spent.
cd /root/repo

until grep -q "AGENDA COMPLETE" results_r3_agenda.log 2>/dev/null; do
  sleep 120
done

mkdir -p results_r3 reports
timeout 5400 python scripts/tune_kernel.py --out reports/kernel_tuning.json \
  2>&1 | tee results_r3/tune_kernel.log
timeout 4800 python bench.py 2>&1 | tee results_r3/bench_final.log
echo "FOLLOWON COMPLETE $(date +%T)"
