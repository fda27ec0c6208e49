#!/bin/bash
# Round-5 queue 2 (serialized under the host-wide heavy lock):
# short TPU experiments first, then the long Beauty reference run.
#   1. rbg pool probe + dropout-strategy sweep  (VERDICT r4 item 5)
#   2. serving stage decomposition + chunked artifact bench (item 4)
#   3. PREPRec full-catalog eval at 100k users x 1M items (item 1)
#   4. driver bench at threshold vs pooled dropout
#   5. Beauty seed-42 reference run to natural early stop (item 2b)
set -u
cd /root/repo
mkdir -p results/r5_runs
exec 9>/tmp/bsarec_tpu_heavy.lock
flock 9

timeout 1800 python benchmarks/rbg_pool_probe.py \
  2>&1 | tee results/r5_runs/rbg_pool_probe.log

timeout 3600 python benchmarks/step_sweep.py --lever dropout \
  --strategies threshold,pooled,u8direct \
  2>&1 | tee results/r5_runs/sweep_pooled.log

timeout 3600 python benchmarks/serving_bench.py \
  2>&1 | tee results/r5_runs/serving_bench_r5.log

timeout 3600 python benchmarks/preprec_scale.py \
  2>&1 | tee results/r5_runs/preprec_scale_1m.log

timeout 2700 python bench.py 2>&1 | tee results/r5_runs/bench_r5_threshold.log
BSAREC_DROPOUT=pooled timeout 2700 python bench.py \
  2>&1 | tee results/r5_runs/bench_r5_pooled.log

echo "QUEUE2 TPU EXPERIMENTS COMPLETE $(date)" | tee -a results/r5_runs/queue2_status.log

timeout 26000 python benchmarks/headtohead_full.py --dataset Beauty --seeds 42 \
  --timeout 25000 --workdir /tmp/headtohead_full \
  2>&1 | tee results/r5_runs/headtohead_full_beauty_driver.log

echo "QUEUE2 COMPLETE $(date)" | tee -a results/r5_runs/queue2_status.log
