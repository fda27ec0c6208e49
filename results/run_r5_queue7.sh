#!/bin/bash
# Round-5 queue 7: scale-proof retry after the OOB-id clamp (76d0635).
# Probe the relay out of the second worker fault, then 20k x 1M, then
# the full 100k x 1M if the 20k run survives.
set -u
cd /root/repo
exec 9>/tmp/bsarec_tpu_heavy.lock
flock 9
LOG=results/r5_runs/queue7_status.log

for i in $(seq 1 12); do
  if timeout 90 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; then
    echo "RECOVERED $(date -u +%FT%TZ) probe=$i" | tee -a $LOG
    break
  fi
  echo "wedged $(date -u +%FT%TZ) probe=$i" | tee -a $LOG
  [ "$i" -eq 12 ] && { echo "GIVING UP $(date)" | tee -a $LOG; exit 7; }
  sleep 180
done

timeout 1800 python benchmarks/preprec_scale.py --users 20000 \
  2>&1 | tee results/r5_runs/preprec_scale_20k_v2.log
echo "SCALE 20K v2 DONE $(date)" | tee -a $LOG

if grep -q "users_per_sec" results/r5_runs/preprec_scale_20k_v2.log; then
  timeout 1800 python benchmarks/preprec_scale.py \
    2>&1 | tee results/r5_runs/preprec_scale_100k_v2.log
  echo "SCALE 100K v2 DONE $(date)" | tee -a $LOG
fi
echo "QUEUE7 COMPLETE $(date)" | tee -a $LOG
