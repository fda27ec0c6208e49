#!/bin/bash
# Round-5 CPU queue 1 (serialized under the host-wide heavy lock):
#   1. LastFM full-convergence head-to-head, 3 seeds, both programs to
#      their natural early stop (VERDICT r4 item 2a).
#   2. PREPRec head-to-head to plateau (epochs budget 100, both programs
#      stop via their own stop_early) (VERDICT r4 item 3, step 1).
set -u
cd /root/repo
mkdir -p results/r5_runs
exec 9>/tmp/bsarec_tpu_heavy.lock
flock 9

timeout 28800 python benchmarks/headtohead_full.py --dataset LastFM --seeds 42,1,2 \
  --workdir /tmp/headtohead_full \
  2>&1 | tee results/r5_runs/headtohead_full_lastfm_driver.log

timeout 14400 python benchmarks/headtohead_preprec.py --epochs 100 \
  --workdir /tmp/headtohead_preprec_r5 \
  --out results/r5_runs/headtohead_preprec_plateau.md \
  2>&1 | tee results/r5_runs/headtohead_preprec_plateau_driver.log

echo "QUEUE1 COMPLETE $(date)" | tee -a results/r5_runs/queue1_status.log
