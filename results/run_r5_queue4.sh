#!/bin/bash
# Round-5 queue 4 (final session). Serialized under the host-wide heavy
# lock; every leg idempotent:
#   1. PREPRec 100k-user x 1M-item memory-bounded eval proof — the
#      r5 first attempt died at remote-compile (HTTP 413: pop tables
#      baked as HLO constants); re-run with the tables-as-runtime-args
#      fix (commit ffbe209).
#   2. 4-shape + PREPRec-phase multichip dryrun — never driver-verified
#      (MULTICHIP_r04.json predates phase 5); run it once here so the
#      round-end driver run is not the first execution.
#   3. Bounded reference Beauty seed-42 run (VERDICT item 2b): torch
#      CPU, hard deadline; per-epoch valid trajectory is the evidence.
#   4. Trajectory report vs our r4 full run + the authors' GPU log.
set -u
cd /root/repo
mkdir -p results/r5_runs
exec 9>/tmp/bsarec_tpu_heavy.lock
flock 9

if ! grep -q "users_per_sec" results/r5_runs/preprec_scale_1m_fixed.log 2>/dev/null; then
  timeout 2400 python benchmarks/preprec_scale.py \
    2>&1 | tee results/r5_runs/preprec_scale_1m_fixed.log
fi
echo "SCALE DONE $(date)" | tee -a results/r5_runs/queue4_status.log

if ! grep -q "PREPRec mesh phase ok" results/r5_runs/dryrun_r5.log 2>/dev/null; then
  JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    timeout 1800 python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)" \
    2>&1 | tee results/r5_runs/dryrun_r5.log
fi
echo "DRYRUN DONE $(date)" | tee -a results/r5_runs/queue4_status.log

DEADLINE=$(date -d "2026-08-20 00:20 UTC" +%s)
NOW=$(date +%s); TLEFT=$(( DEADLINE - NOW ))
mkdir -p /tmp/h2h_beauty
if [ "$TLEFT" -gt 600 ] && ! grep -q "Test Score" /tmp/h2h_beauty/ref_beauty_s42.log 2>/dev/null; then
  PYTHONPATH="/root/reference/src:${PYTHONPATH:-}" timeout "$TLEFT" \
    python /root/reference/src/main.py \
      --data_name Beauty --model_type BSARec --num_attention_heads 1 \
      --c 5 --alpha 0.7 --lr 0.0005 --seed 42 --no_cuda --epochs 500 \
      --data_dir /root/reference/src/data/ --output_dir /tmp/h2h_beauty/ \
      --train_name ref_beauty_s42 \
      > /tmp/h2h_beauty/ref_beauty_s42.console.log 2>&1
  echo "REF BEAUTY rc=$? (timeout=$TLEFT s)" | tee -a results/r5_runs/queue4_status.log
fi

cp /tmp/h2h_beauty/ref_beauty_s42.log results/r5_runs/ref_beauty_s42_partial.log 2>/dev/null
timeout 300 python benchmarks/headtohead_beauty_traj.py \
  2>&1 | tee -a results/r5_runs/queue4_status.log
echo "QUEUE4 COMPLETE $(date)" | tee -a results/r5_runs/queue4_status.log
