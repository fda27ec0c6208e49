#!/bin/bash
# TPU backlog for relay recovery (round 3). Everything here was blocked
# by the axon-relay wedge; run top to bottom once
# `python -c "import jax; jax.devices()"` returns promptly.
set -u
cd /root/repo
OUT=results/r3_runs
mkdir -p $OUT

# 1. Dropout-strategy sweep on the chip (threshold vs u8 vs bernoulli
#    vs bits at the bench config). Picks the round-3 default; if u8
#    wins, set BSAREC_DROPOUT=u8 in bench.py's env defaults and
#    refresh BASELINE.md's "where the time goes".
timeout 3600 python benchmarks/step_sweep.py --lever dropout \
  2>&1 | tee $OUT/sweep_dropout_onchip.log

# 2. Driver bench sanity (same JSON line the driver records).
timeout 1800 python bench.py 2>&1 | tee $OUT/bench_post_recovery.log

# 3. Beauty 5-seed band + the fastdrop parity rerun (skips completed
#    runs by Test Score grep).
bash results/run_quality_r3.sh 2>&1 | tee -a $OUT/quality_r3_driver.log
