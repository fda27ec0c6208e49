#!/bin/bash
# Round-5 queue 6: recover from the TPU worker fault that killed the
# 100k x 1M scale proof mid-execution (preprec_scale_1m_fixed2.log,
# 00:03Z — the r4-documented worker-fault mode near ~1 GB HBM resident;
# resident here was ~700 MB of pop tables + user arrays). Probe the
# relay until it answers, then re-run the proof at 20k users (the
# per-step footprint is independent of U — only resident user arrays
# shrink), and if that survives, retry the full 100k.
set -u
cd /root/repo
exec 9>/tmp/bsarec_tpu_heavy.lock
flock 9
LOG=results/r5_runs/queue6_status.log

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
  2>&1 | tee results/r5_runs/preprec_scale_20k.log
echo "SCALE 20K DONE $(date)" | tee -a $LOG

if grep -q "users_per_sec" results/r5_runs/preprec_scale_20k.log; then
  timeout 1800 python benchmarks/preprec_scale.py \
    2>&1 | tee results/r5_runs/preprec_scale_100k.log
  echo "SCALE 100K DONE $(date)" | tee -a $LOG
fi
echo "QUEUE6 COMPLETE $(date)" | tee -a $LOG
