#!/bin/bash
# Round-2 quality runs (VERDICT items 2 & 10).
#
# The reference ships winning configs only for Beauty and LastFM
# (src/output/*.log line 1). For Toys/Sports/Yelp we sweep the paper's
# hyperparameter ranges (alpha in {0.5,0.7,0.9}, c in {3,5,7}, lr in
# {5e-4,1e-3} — README.md:34-50 shows the flag surface) and report the
# best validation config's test row, mirroring how the paper tuned.
# Zoo tuning: SASRec/FMLP-Rec on Beauty at lr 5e-4 (round-1 table used
# an untuned lr 1e-3 for all non-BSARec models).
set -u
cd /root/repo
OUT=results/r2_runs
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

for ds in Toys_and_Games Sports_and_Outdoors Yelp; do
  run q2_${ds}_a7c5lr5 --data_name $ds --model_type BSARec --num_attention_heads 1 --lr 0.0005 --alpha 0.7 --c 5
  run q2_${ds}_a9c3lr1 --data_name $ds --model_type BSARec --num_attention_heads 1 --lr 0.001 --alpha 0.9 --c 3
  run q2_${ds}_a5c7lr5 --data_name $ds --model_type BSARec --num_attention_heads 1 --lr 0.0005 --alpha 0.5 --c 7
done

# zoo tuning on Beauty (round-1 gaps: SASRec 0.0300 vs paper ~0.033, FMLP 0.0331 vs ~0.036)
run q2_Beauty_sasrec_lr5 --data_name Beauty --model_type SASRec --lr 0.0005
run q2_Beauty_fmlp_lr5 --data_name Beauty --model_type FMLPRec --lr 0.0005
run q2_Beauty_sasrec_lr1d25 --data_name Beauty --model_type SASRec --lr 0.001 \
  --hidden_dropout_prob 0.25 --attention_probs_dropout_prob 0.25
run q2_Beauty_fmlp_lr1d25 --data_name Beauty --model_type FMLPRec --lr 0.001 \
  --hidden_dropout_prob 0.25 --attention_probs_dropout_prob 0.25

# bf16 mixed-precision quality parity (VERDICT item 3): the paper config
# with --dtype bf16 must land within run variance of the fp32 row
run q2_Beauty_bsarec_bf16 --data_name Beauty --model_type BSARec \
  --num_attention_heads 1 --lr 0.0005 --alpha 0.7 --c 5 --dtype bf16
echo "ALL RUNS DONE"
