#!/bin/bash
# Round-5 queue 8: with no hard wall-clock cutoff this driver epoch,
# take the Beauty head-to-head all the way — the reference program
# (torch CPU, seed 42, winning config) to its NATURAL early stop
# (~65 epochs, ~6.5 h at 5.8 min/epoch). A sidecar loop copies the
# growing log into results/ every 10 min so a session/machine death
# still leaves committed-able evidence. A bench.py sanity run first
# confirms the chip is healthy after the worker faults.
set -u
cd /root/repo
exec 9>/tmp/bsarec_tpu_heavy.lock
flock 9
LOG=results/r5_runs/queue8_status.log
WORK=/tmp/h2h_beauty
mkdir -p $WORK

timeout 1800 python bench.py 2>&1 | tee results/r5_runs/bench_r5_final.log
echo "BENCH DONE $(date)" | tee -a $LOG

if ! grep -q "Test Score" $WORK/ref_beauty_s42full.log 2>/dev/null; then
  ( while true; do
      sleep 600
      cp $WORK/ref_beauty_s42full.log \
         results/r5_runs/ref_beauty_s42_full_progress.log 2>/dev/null
    done ) &
  CPLOOP=$!
  PYTHONPATH="/root/reference/src:${PYTHONPATH:-}" timeout 30000 \
    python /root/reference/src/main.py \
      --data_name Beauty --model_type BSARec --num_attention_heads 1 \
      --c 5 --alpha 0.7 --lr 0.0005 --seed 42 --no_cuda --epochs 500 \
      --data_dir /root/reference/src/data/ --output_dir $WORK/ \
      --train_name ref_beauty_s42full \
      > $WORK/ref_beauty_s42full.console.log 2>&1
  echo "REF BEAUTY FULL rc=$?" | tee -a $LOG
  kill $CPLOOP 2>/dev/null
fi
cp $WORK/ref_beauty_s42full.log results/r5_runs/ref_beauty_s42_full_progress.log 2>/dev/null
timeout 300 python benchmarks/headtohead_beauty_traj.py \
  --ref-log $WORK/ref_beauty_s42full.log \
  --out results/r5_runs/headtohead_beauty_full.md 2>&1 | tee -a $LOG
echo "QUEUE8 COMPLETE $(date)" | tee -a $LOG
