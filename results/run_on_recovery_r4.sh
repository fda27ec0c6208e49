#!/bin/bash
# TPU backlog for relay recovery (round 4) — supersedes
# results/run_on_recovery_r3.sh. Run top to bottom once
# `timeout 90 python -c "import jax; jax.devices()"` returns promptly.
# Everything is idempotent (skip-if-done greps) and bounded (timeouts).
#
# Wedge-proofing (VERDICT r3 item 7): the WHOLE queue holds the
# host-wide heavy-job lock, so no CPU-heavy script can overlap the chip
# work; bench.py additionally takes the same lock itself.
set -u
cd /root/repo
exec 9>/tmp/bsarec_tpu_heavy.lock
flock 9
OUT=results/r4_runs
mkdir -p $OUT

# 1. Driver bench first (the round-3 headline was lost to the wedge):
#    FastDropout + auto unroll, now self-reporting eval_users_per_sec,
#    flops_per_example, pct_of_no_dropout_ceiling, pct_of_mxu_peak.
if ! grep -q '"value": [1-9]' $OUT/bench_r4.log 2>/dev/null; then
  timeout 1800 python bench.py 2>&1 | tee $OUT/bench_r4.log
fi
timeout 1800 python bench.py --dtype bf16 2>&1 | tee $OUT/bench_r4_bf16.log

# 2. Dropout-strategy sweep on the chip (threshold vs u8 vs bernoulli vs
#    bits). If u8 wins, flip the default in core/dropout.py:_strategy
#    and refresh BASELINE.md.
if ! grep -q '"u8"' $OUT/sweep_dropout_onchip.log 2>/dev/null; then
  timeout 3600 python benchmarks/step_sweep.py --lever dropout \
    2>&1 | tee $OUT/sweep_dropout_onchip.log
fi

# 3. Gap decomposition (VERDICT r3 item 4): full vs RNG-free vs
#    dropout-off at unroll 8 -> per-step µs attribution (gen/apply).
if ! grep -q 'attribution_us' $OUT/sweep_component.log 2>/dev/null; then
  timeout 3600 python benchmarks/step_sweep.py --lever component \
    2>&1 | tee $OUT/sweep_component.log
fi

# 4. Beauty 5-seed band + fastdrop parity (same script as r3 — skips
#    completed runs by Test Score grep; ~2-4 min per run on the chip).
bash results/run_quality_r3.sh 2>&1 | tee -a $OUT/quality_driver.log

# 5. LastFM at max_seq_length 200 (VERDICT r3 item 6: the only mounted
#    dataset where L=200 changes the data seen; mean seq len 48.2).
if ! grep -q "Test Score" $OUT/q4_LastFM_L200.log 2>/dev/null; then
  timeout 3600 python -m bsarec_tpu.main --data_name LastFM \
    --model_type BSARec --c 3 --alpha 0.9 --num_attention_heads 1 \
    --max_seq_length 200 --prng rbg --output_dir $OUT/ \
    --train_name q4_LastFM_L200 2>&1 | tail -5
fi
# paired L=50 run, same PRNG/defaults, for the quality+throughput row
if ! grep -q "Test Score" $OUT/q4_LastFM_L50.log 2>/dev/null; then
  timeout 3600 python -m bsarec_tpu.main --data_name LastFM \
    --model_type BSARec --c 3 --alpha 0.9 --num_attention_heads 1 \
    --prng rbg --output_dir $OUT/ --train_name q4_LastFM_L50 2>&1 | tail -5
fi

# 6. Batch-size scaling sweep (round-2 leftover; written, never run).
if [ ! -s $OUT/batch_scaling.log ]; then
  timeout 2400 python benchmarks/batch_scaling.py 2>&1 | tee $OUT/batch_scaling.log
fi

# 7. Million-item end-to-end Trainer run (f32 + bf16).
if [ ! -s $OUT/million_e2e_f32.log ]; then
  timeout 3600 python benchmarks/million_item_e2e.py 2>&1 | tee $OUT/million_e2e_f32.log
fi
if [ ! -s $OUT/million_e2e_bf16.log ]; then
  timeout 3600 python benchmarks/million_item_e2e.py --dtype bfloat16 \
    2>&1 | tee $OUT/million_e2e_bf16.log
fi

# 8. Serving: rank-precision bench + on-TPU artifact load (artifacts
#    regenerated from the verify checkpoint; serving now masks seen
#    items to -inf — ADVICE r3 medium).
if [ ! -s $OUT/serving_bench_1m.log ]; then
  timeout 1800 python benchmarks/serving_bench.py 2>&1 | tee $OUT/serving_bench_1m.log
fi
if [ -f /tmp/verify_out/verify_run.ckpt ]; then
  timeout 900 python -m bsarec_tpu.main --data_name LastFM --model_type BSARec \
    --c 3 --alpha 0.9 --do_eval --load_model verify_run --train_name verify_exp \
    --output_dir /tmp/verify_out/ --export_serving /tmp/verify_out/scorer.jaxexp
  timeout 900 python -m bsarec_tpu.main --data_name LastFM --model_type BSARec \
    --c 3 --alpha 0.9 --do_eval --load_model verify_run --train_name verify_exp8 \
    --output_dir /tmp/verify_out/ --export_serving /tmp/verify_out/scorer_int8.jaxexp \
    --serving_quant int8
  timeout 900 python - 2>&1 | tee $OUT/serving_tpu_load.log <<'PYEOF'
import numpy as np
from bsarec_tpu.serving import load_scorer
for p in ("/tmp/verify_out/scorer.jaxexp", "/tmp/verify_out/scorer_int8.jaxexp"):
    s = load_scorer(p)
    ids = np.zeros((4, s.max_len), np.int32)
    ids[:, -3:] = [5, 9, 12]
    seen = np.zeros((4, s.seen_width), np.int32)
    seen[:, :3] = [5, 9, 12]
    out = s.topk(ids, None, seen)
    assert 0 not in out and not (set(out.flatten()) & {5, 9, 12})
    print(p, out[:, :5].tolist())
PYEOF
fi

echo QUEUE_DONE
