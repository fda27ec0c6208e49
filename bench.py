"""Benchmark: BSARec training throughput on Amazon Beauty (config #1).

Prints one JSON line:
  {"metric": "train_examples_per_sec", "value": N, "unit": "examples/s",
   "vs_baseline": N / 10100.0}

Baseline: the reference's ~10,100 examples/s on the authors' CUDA GPU
(BASELINE.md, derived from BSARec_Beauty_best.log timestamps).
"""

from __future__ import annotations

import json
import logging
import time

BASELINE_EXAMPLES_PER_SEC = 10_100.0

# Framework's own dropout-free throughput ceiling on this config
# (BASELINE.md "where the time actually goes": dropout off -> 301k ex/s,
# measured round 2 on the chip). The headline number self-reports
# against it so "fast" is judged against the chip, not just the
# authors' GPU.
NO_DROPOUT_CEILING = 301_000.0
# v5e MXU peaks (chip spec; BASELINE.md roofline notes)
PEAK_FLOPS = {"fp32": 99e12, "bf16": 197e12}


def analytic_flops_per_example(L, H, V, layers, heads_intermediate=4):
    """Matmul FLOPs per example for one TRAIN step of the parity BSARec
    config (fwd + ~2x for backward). Counted: QKV/out projections
    (4·L·H²), attention scores+context (2·L²·H), FFN (2·L·H·4H), the
    frequency layer's [L, L] DFT projection (L²·H, `ops/frequency.py`),
    and the last-position dense CE over the catalog (V·H). Elementwise
    work (LayerNorm, GELU, dropout masks, softmax) is excluded — on this
    config it dominates *time* (VPU-bound) but not FLOPs, which is the
    point the emitted utilization makes."""
    per_layer = (4 * L * H * H + 2 * L * L * H
                 + 2 * L * H * heads_intermediate * H + L * L * H)
    fwd = 2 * (per_layer * layers + V * H)  # MACs -> FLOPs
    return 3 * fwd  # backward ~ 2x forward


def _backend_reachable(timeout_s: float = 240.0) -> bool:
    """Probe jax backend init in a subprocess with a hard timeout.

    When the axon TPU relay wedges, EVERY jax init in this process
    would hang forever (CLAUDE.md environment rules) — including this
    benchmark. Probing out-of-process keeps the failure bounded and
    lets us emit an honest error line instead of hanging the driver.
    """
    import subprocess
    import sys

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True,
        )
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def main():
    import argparse

    from bsarec_tpu.config import ModelConfig, TrainConfig
    from bsarec_tpu.data.corpus import load_corpus
    from bsarec_tpu.data.pipeline import SeqRecData
    from bsarec_tpu.train.trainer import Trainer

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--dtype", default="fp32", choices=("fp32", "bf16"),
        help="compute policy for the benchmarked run (quality parity for "
        "bf16: results/quality_zoo_r2.md)",
    )
    parser.add_argument(
        "--prng", default="rbg", choices=("rbg", "threefry"),
        help="rbg (hardware RNG, default) makes the p=0.5 dropout masks "
        "~free: 154k -> ~248k ex/s on this config. Same Bernoulli "
        "dropout, different random stream; quality parity evidenced in "
        "results/quality_zoo_r2.md",
    )
    args = parser.parse_args()

    if not _backend_reachable():
        print(json.dumps({
            "metric": "train_examples_per_sec", "value": 0.0,
            "unit": "examples/s", "vs_baseline": 0.0,
            "error": "TPU backend unreachable (jax init hung >240s; "
                     "axon relay wedged) — no measurement taken",
        }))
        raise SystemExit(1)

    # serialize against CPU-heavy jobs: overlapping them with on-chip
    # work is the suspected relay-wedge trigger on this 1-core host
    # (utils/heavylock.py; held until exit)
    from bsarec_tpu.utils.heavylock import acquire

    acquire("bench.py")

    if args.prng == "rbg":
        import jax

        jax.config.update("jax_default_prng_impl", "rbg")

    logger = logging.getLogger("bench")
    logger.addHandler(logging.NullHandler())
    logger.propagate = False

    corpus = load_corpus("/root/reference/src/data/Beauty.txt")
    data = SeqRecData(corpus, max_len=50)
    model_cfg = ModelConfig(
        model_type="bsarec", item_size=corpus.item_size, num_users=corpus.num_users + 1,
        max_seq_length=50, hidden_size=64, num_hidden_layers=2, num_attention_heads=1,
        c=5, alpha=0.7,
        compute_dtype="bfloat16" if args.dtype == "bf16" else "float32",
    )
    train_cfg = TrainConfig(lr=5e-4, batch_size=256, seed=42)
    trainer = Trainer(model_cfg, train_cfg, data, logger, "/tmp/bench.ckpt")

    # warmup epoch (compile)
    trainer.train(0)

    n_epochs = 3
    t0 = time.time()
    for e in range(1, 1 + n_epochs):
        trainer.train(e)
    dt = time.time() - t0
    ex_per_sec = n_epochs * data.train.num_samples / dt

    # full-catalog eval throughput (22,363 users x 12,102-item catalog,
    # on-device scoring + seen-masking + top-20; reference: ~3,250
    # users/s GPU+host-numpy). Each valid() forces a host readback of
    # the metric sums, so wall-clock over k rounds is trustworthy.
    trainer.valid(0)  # compile
    n_evals = 3
    t0 = time.time()
    for _ in range(n_evals):
        trainer.valid(0)
    users_per_sec = n_evals * data.valid.num_users / (time.time() - t0)

    # hardware-limit framing (VERDICT r3 item 5): FLOPs/example is
    # analytic; utilization = achieved matmul FLOP/s over the MXU peak.
    # Low %MXU is expected and honest — this config is VPU/RNG-bound
    # (BASELINE.md), so the ceiling field is the meaningful one.
    flops_ex = analytic_flops_per_example(
        model_cfg.max_seq_length, model_cfg.hidden_size,
        model_cfg.item_size, model_cfg.num_hidden_layers)

    # one driver-parsed JSON line; eval throughput rides as extra fields
    print(
        json.dumps(
            {
                "metric": "train_examples_per_sec",
                "value": round(ex_per_sec, 1),
                "unit": "examples/s",
                "vs_baseline": round(ex_per_sec / BASELINE_EXAMPLES_PER_SEC, 3),
                "eval_users_per_sec": round(users_per_sec, 1),
                "eval_vs_baseline": round(users_per_sec / 3_250.0, 1),
                "flops_per_example": flops_ex,
                "pct_of_no_dropout_ceiling": round(
                    100.0 * ex_per_sec / NO_DROPOUT_CEILING, 1),
                "pct_of_mxu_peak": round(
                    100.0 * ex_per_sec * flops_ex / PEAK_FLOPS[args.dtype], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
