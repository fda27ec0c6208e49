#!/bin/bash
# Round-5 queue 5: re-run the PREPRec 100k x 1M memory-bounded eval
# proof after the popularity-gather fix (commit 2c28b59) removed the
# O(V)-per-candidate gather intermediate that failed TPU compilation.
set -u
cd /root/repo
exec 9>/tmp/bsarec_tpu_heavy.lock
flock 9
timeout 2100 python benchmarks/preprec_scale.py \
  2>&1 | tee results/r5_runs/preprec_scale_1m_fixed2.log
echo "QUEUE5 COMPLETE $(date)" | tee -a results/r5_runs/queue4_status.log
