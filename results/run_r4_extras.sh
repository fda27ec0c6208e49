#!/bin/bash
# Round-4 extras: run AFTER results/run_on_recovery_r3.sh completes
# (the quality-run step inside it does not hold the heavy lock, so
# starting this early could overlap with on-chip quality runs).
#
# Covers VERDICT r3 items 3 (head-to-head vs the mounted reference
# programs), 4 (decompose the 260k->301k gap), and 6 (real-data
# long-sequence quality: LastFM at maxlen=200).
exec 9>/tmp/bsarec_tpu_heavy.lock
flock 9
set -u
cd /root/repo
OUT=results/r4_runs
mkdir -p $OUT

# 1. Gap attribution at the bench config: full dropout vs RNG-free
#    diagnostic masks vs dropout off -> per-step µs for mask generation
#    vs mask apply vs everything else (VERDICT r3 item 4).
timeout 3600 python benchmarks/step_sweep.py --lever component \
  2>&1 | tee $OUT/sweep_component.log

# 2. LastFM at maxlen=200 (the only mounted dataset where L=200 changes
#    the data seen: mean seq len 48.2, many users >50). Paper-winning
#    LastFM config otherwise (c=3, alpha=0.9, lr=1e-3, heads=1).
#    Companion L=50 run already exists (results/quality_zoo_r2.md).
timeout 5400 python -m bsarec_tpu.main --data_name LastFM --model_type BSARec \
  --c 3 --alpha 0.9 --lr 0.001 --num_attention_heads 1 --seed 42 \
  --max_seq_length 200 --output_dir $OUT/ --train_name q4_LastFM_L200 \
  2>&1 | tee $OUT/q4_LastFM_L200.console.log

# 1b. Batch-size/dtype sweep at the shipped rbg defaults (the backlog's
#     run predates batch_scaling.py's --prng flag and measured threefry).
timeout 2400 python benchmarks/batch_scaling.py \
  2>&1 | tee $OUT/batch_scaling_rbg.log

# 2b. Beauty threefry seed band: the 5-seed rbg band (q3_Beauty_seed*)
#     tops out at HR@5 .0730 while the reference's single seed logged
#     .0736 — these runs separate "rbg stream shifts quality slightly"
#     from "run variance" (round-1 threefry parity run hit .0721).
for seed in 42 1 2; do
  f=$OUT/q4_Beauty_threefry_seed${seed}.log
  if [ -f "$f" ] && grep -q "Test Score" "$f"; then echo "skip $f"; continue; fi
  # (no tee: main.py's logger owns $f — teeing the same path would clobber)
  timeout 3600 python -m bsarec_tpu.main --data_name Beauty --model_type BSARec \
    --num_attention_heads 1 --lr 0.0005 --alpha 0.7 --c 5 --prng threefry \
    --seed $seed --output_dir $OUT/ --train_name q4_Beauty_threefry_seed${seed} \
    || echo "FAILED seed $seed"
done

# 3. Head-to-head: mounted reference programs executed HERE (torch CPU)
#    vs this framework on identical data (VERDICT r3 item 3a+3b).
timeout 14400 python benchmarks/headtohead_preprec.py \
  2>&1 | tee $OUT/headtohead_preprec_driver.log
timeout 14400 python benchmarks/headtohead_src.py --epochs 15 \
  2>&1 | tee $OUT/headtohead_src_driver.log

echo R4_EXTRAS_DONE
