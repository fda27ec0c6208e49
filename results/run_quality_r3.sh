#!/bin/bash
# Round-3 quality runs.
#
# 1. Multi-seed variance band for the Beauty paper config: the parity
#    claim is "within run-to-run variance" — these 5 seeds measure that
#    variance directly (the reference logs only seed 42,
#    `src/output/BSARec_Beauty_best.log:1`). Each full early-stopped run
#    is ~2-4 min on the chip at ~250k ex/s.
# 2. Re-run of the FastDropout + scan_unroll=8 default-config parity run
#    (the first attempt died at epoch 1 when the TPU relay wedged).
set -u
cd /root/repo
OUT=results/r3_runs
mkdir -p $OUT
run() {
  name=$1; shift
  if [ -f "$OUT/$name.log" ] && grep -q "Test Score" "$OUT/$name.log"; then
    echo "skip $name (done)"; return
  fi
  echo "=== $name: $* ==="
  timeout 3600 python -m bsarec_tpu.main --output_dir $OUT/ --train_name "$name" "$@" \
    || echo "FAILED $name"
}

# paper config, round-3 defaults (rbg hardware-RNG FastDropout, unroll 8)
for seed in 42 1 2 3 4; do
  run q3_Beauty_seed${seed} --data_name Beauty --model_type BSARec \
    --num_attention_heads 1 --lr 0.0005 --alpha 0.7 --c 5 --prng rbg --seed $seed
done
