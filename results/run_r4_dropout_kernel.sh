#!/bin/bash
# Round-4 fused-dropout-kernel queue: validate the Pallas kernel on the
# chip, then re-run the dropout-strategy sweep with the new "pallas"
# strategy included. If pallas wins, the default flips in
# core/dropout.py:_strategy and BASELINE.md gets refreshed.
set -u
cd /root/repo
exec 9>/tmp/bsarec_tpu_heavy.lock
flock 9
OUT=results/r4_runs
mkdir -p $OUT

if ! grep -q '"ok": true' $OUT/pallas_dropout_validate.log 2>/dev/null; then
  timeout 1800 python benchmarks/validate_pallas_dropout.py \
    2>&1 | tee $OUT/pallas_dropout_validate.log
fi

# only measure if validation passed
if grep -q '"ok": true' $OUT/pallas_dropout_validate.log; then
  if ! grep -q '"pallas"' $OUT/sweep_dropout_pallas.log 2>/dev/null; then
    timeout 3600 python benchmarks/step_sweep.py --lever dropout \
      2>&1 | tee $OUT/sweep_dropout_pallas.log
  fi
fi

echo R4_DROPOUT_KERNEL_DONE
