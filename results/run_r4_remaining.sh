#!/bin/bash
# Round-4 remaining TPU queue: the steps of run_on_recovery_r4.sh that
# the previous session never reached (7: million-item e2e, 8: serving),
# plus a fresh driver-bench artifact and the bf16@2048 fresh-process
# diagnostic (the batch_scaling_rbg.log row measured 82.8k ex/s as the
# LAST config of one process — rerun alone to separate a real cliff
# from benchmark-process HBM accumulation).
set -u
cd /root/repo
exec 9>/tmp/bsarec_tpu_heavy.lock
flock 9
OUT=results/r4_runs
mkdir -p $OUT

# 0. Fresh driver-bench artifact at the shipped defaults.
if ! grep -q '"value": [1-9]' $OUT/bench_r4.log 2>/dev/null; then
  timeout 1800 python bench.py 2>&1 | tee $OUT/bench_r4.log
fi

# 1. bf16@2048 and fp32@2048 fresh-process reruns (diagnostic).
if [ ! -s $OUT/batch2048_bf16_fresh.log ]; then
  timeout 2400 python benchmarks/batch_scaling.py --batches 2048 \
    --dtypes bfloat16 2>&1 | tee $OUT/batch2048_bf16_fresh.log
fi
if [ ! -s $OUT/batch2048_f32_fresh.log ]; then
  timeout 2400 python benchmarks/batch_scaling.py --batches 2048 \
    --dtypes float32 2>&1 | tee $OUT/batch2048_f32_fresh.log
fi

# 2. Million-item end-to-end Trainer run (f32 + bf16) — exercises the
#    round-4 on-device per-batch seen-bitmask path end to end.
if ! grep -q '"train_examples_per_sec"' $OUT/million_e2e_f32.log 2>/dev/null; then
  timeout 3600 python benchmarks/million_item_e2e.py 2>&1 | tee $OUT/million_e2e_f32.log
fi
if ! grep -q '"train_examples_per_sec"' $OUT/million_e2e_bf16.log 2>/dev/null; then
  timeout 3600 python benchmarks/million_item_e2e.py --dtype bfloat16 \
    2>&1 | tee $OUT/million_e2e_bf16.log
fi

# 3. Serving: rank-precision bench + on-TPU artifact load (artifacts
#    regenerated fresh; serving masks seen items to -inf — ADVICE r3).
if ! grep -q '"metric"' $OUT/serving_bench_1m.log 2>/dev/null; then
  timeout 1800 python benchmarks/serving_bench.py 2>&1 | tee $OUT/serving_bench_1m.log
fi
if [ ! -f /tmp/verify_out/verify_run.ckpt ]; then
  timeout 1800 python -m bsarec_tpu.main --data_name LastFM --model_type BSARec \
    --c 3 --alpha 0.9 --epochs 3 --patience 3 \
    --output_dir /tmp/verify_out/ --train_name verify_run 2>&1 | tail -3
fi
if ! grep -q scorer_int8 $OUT/serving_tpu_load.log 2>/dev/null; then
  timeout 900 python -m bsarec_tpu.main --data_name LastFM --model_type BSARec \
    --c 3 --alpha 0.9 --do_eval --load_model verify_run --train_name verify_exp \
    --output_dir /tmp/verify_out/ --export_serving /tmp/verify_out/scorer.jaxexp 2>&1 | tail -2
  timeout 900 python -m bsarec_tpu.main --data_name LastFM --model_type BSARec \
    --c 3 --alpha 0.9 --do_eval --load_model verify_run --train_name verify_exp8 \
    --output_dir /tmp/verify_out/ --export_serving /tmp/verify_out/scorer_int8.jaxexp \
    --serving_quant int8 2>&1 | tail -2
  # heredoc must bind to python, not tee (first run got this wrong and
  # tee'd the script text into the log without executing it)
  timeout 900 python - <<'PYEOF' 2>&1 | tee $OUT/serving_tpu_load.log
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

echo R4_REMAINING_DONE
