#!/bin/bash
# Round-4 fused-dropout queue, take 2: the first validation failed to
# COMPILE (Mosaic rejects 3-value prng_seed; block id now mixed into
# word 2 with a golden-ratio hash), and the serving load-check heredoc
# bound to tee instead of python. Reruns both.
set -u
cd /root/repo
exec 9>/tmp/bsarec_tpu_heavy.lock
flock 9
OUT=results/r4_runs
mkdir -p $OUT

timeout 1800 python benchmarks/validate_pallas_dropout.py \
  2>&1 | tee $OUT/pallas_dropout_validate.log

if grep -q '"ok": true' $OUT/pallas_dropout_validate.log; then
  timeout 3600 python benchmarks/step_sweep.py --lever dropout \
    2>&1 | tee $OUT/sweep_dropout_pallas.log
fi

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
    print("LOAD_OK", p, out[:, :5].tolist())
PYEOF

echo R4_DROPOUT_KERNEL2_DONE
