#!/bin/bash
# TPU backlog for relay recovery (round 3). Everything here was blocked
# by the axon-relay wedge (down since ~2026-08-17 13:10); run top to
# bottom once `python -c "import jax; jax.devices()"` returns promptly.
#
# Before starting: pause/stop CPU-heavy background jobs (the quality
# run, pytest) — heartbeat starvation on this 1-core host is the
# suspected wedge trigger (project memory).
set -u
cd /root/repo
OUT=results/r3_runs
mkdir -p $OUT

# 1. Driver bench sanity first (same JSON line the driver records;
#    round-3 defaults: FastDropout threshold masks + scan_unroll 8).
timeout 1800 python bench.py 2>&1 | tee $OUT/bench_r3.log

# 2. Dropout-strategy sweep on the chip (threshold vs u8 vs bernoulli
#    vs bits at the bench config). If u8 wins, flip the default in
#    core/dropout.py:_strategy and refresh BASELINE.md's
#    "where the time actually goes".
timeout 3600 python benchmarks/step_sweep.py --lever dropout \
  2>&1 | tee $OUT/sweep_dropout_onchip.log

# 3. Beauty 5-seed band + the fastdrop parity rerun (skips completed
#    runs by Test Score grep; ~2-4 min per run on the chip).
bash results/run_quality_r3.sh 2>&1 | tee -a $OUT/quality_r3_driver.log

# 4. Batch-size scaling sweep (round-2 leftover; written, never run).
timeout 2400 python benchmarks/batch_scaling.py 2>&1 | tee $OUT/batch_scaling.log

# 5. Million-item end-to-end Trainer run (f32 + bf16).
timeout 3600 python benchmarks/million_item_e2e.py 2>&1 | tee $OUT/million_e2e_f32.log
timeout 3600 python benchmarks/million_item_e2e.py --dtype bfloat16 \
  2>&1 | tee $OUT/million_e2e_bf16.log

# 6. Serving: rank-precision bench + on-TPU artifact load. The fp32 and
#    int8 artifacts are regenerated from the verify checkpoint so this
#    step is self-contained (prior /tmp artifacts were cleaned).
timeout 1800 python benchmarks/serving_bench.py 2>&1 | tee $OUT/serving_bench_1m.log
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
    print(p, s.topk(ids)[:, :5].tolist())
PYEOF
fi

echo QUEUE_DONE
