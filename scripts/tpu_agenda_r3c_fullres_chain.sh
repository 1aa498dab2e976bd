#!/bin/bash
# Final link in the round-2 background chain: once the quick suite +
# kernel sweep + bench (tpu_agenda_r3c.sh -> _followon.sh) are done, run
# the full capture-resolution 8-object suite (tpu_agenda_r3b.sh). Its
# per-object --resume + per-object aggregation means however far it gets
# before the round ends is preserved in reports/suite_r2_8obj_fullres.*.
cd /root/repo

until grep -q "FOLLOWON COMPLETE" /tmp/followon.log 2>/dev/null; do
  sleep 300
done

bash scripts/tpu_agenda_r3b.sh > results_r3_fullres_agenda.log 2>&1
echo "FULLRES CHAIN COMPLETE $(date +%T)"
