#!/bin/bash
# Round-5 queue 3 (relaunch after the session crash killed queues 1/2;
# all legs idempotent, serialized under the host-wide heavy lock):
#   1. LastFM full-convergence head-to-head completion — ref seed 42 is
#      done on disk and skips; ref seeds 1,2 + ours seeds 42,1,2 run.
#   2. Short TPU evidence runs: chunked-serving decomposition (VERDICT
#      item 4), PREPRec 100k x 1M eval scaling proof (item 1), driver
#      bench at threshold vs pooled dropout (item 5 certification).
#   3. Beauty seed-42 reference run (item 2b) with every remaining
#      minute up to the hard deadline; per-epoch valid trajectory is
#      evidence even if the natural early stop is not reached.
set -u
cd /root/repo
mkdir -p results/r5_runs
exec 9>/tmp/bsarec_tpu_heavy.lock
flock 9
DEADLINE=$(date -d "19:00" +%s)

timeout 9000 python benchmarks/headtohead_full.py --dataset LastFM --seeds 42,1,2 \
  --workdir /tmp/headtohead_full \
  2>&1 | tee -a results/r5_runs/headtohead_full_lastfm_driver.log
echo "LASTFM DONE $(date)" | tee -a results/r5_runs/queue3_status.log

timeout 2400 python benchmarks/serving_bench.py \
  2>&1 | tee results/r5_runs/serving_bench_r5.log
timeout 2400 python benchmarks/preprec_scale.py \
  2>&1 | tee results/r5_runs/preprec_scale_1m.log
timeout 1800 python bench.py 2>&1 | tee results/r5_runs/bench_r5_threshold.log
BSAREC_DROPOUT=pooled timeout 1800 python bench.py \
  2>&1 | tee results/r5_runs/bench_r5_pooled.log
echo "SHORT EXPERIMENTS DONE $(date)" | tee -a results/r5_runs/queue3_status.log

NOW=$(date +%s); TLEFT=$(( DEADLINE - NOW ))
if [ "$TLEFT" -gt 1200 ]; then
  timeout "$TLEFT" python benchmarks/headtohead_full.py --dataset Beauty --seeds 42 \
    --timeout $(( TLEFT - 300 )) --workdir /tmp/headtohead_full \
    2>&1 | tee results/r5_runs/headtohead_full_beauty_driver.log
fi
echo "QUEUE3 COMPLETE $(date)" | tee -a results/r5_runs/queue3_status.log
