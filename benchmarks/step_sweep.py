"""Paired throughput sweeps at the bench config (Beauty / BSARec).

Sweeps one lever at a time over the full training path (whole-epoch
jitted scan, rbg PRNG) and prints ex/s per setting. Used to pick the
round-3 defaults recorded in BASELINE.md:

  --lever unroll    : epoch-scan unroll factor   (2->245k 4->254k 8->260k, cliff at 16)
  --lever dropout   : mask construction strategy (threshold > bernoulli > bits)
  --lever component : decompose the gap to the no-dropout ceiling
                      (VERDICT r3 item 4): full masks vs RNG-free
                      diagnostic masks ("iota" strategy, zero generation
                      cost / full apply cost) vs dropout off — prints
                      the per-step µs attribution gen/apply/rest

Timing note (CLAUDE.md): each epoch is ONE jitted scan whose readback
(`float(loss)`) gates the next dispatch, so wall-clock over 3 epochs is
trustworthy on the axon tunnel.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_point(data, unroll: int, dropout: float = 0.5) -> float:
    from bsarec_tpu.config import ModelConfig, TrainConfig
    from bsarec_tpu.train.trainer import Trainer

    logger = logging.getLogger("sweep")
    logger.addHandler(logging.NullHandler())
    logger.propagate = False
    cfg = ModelConfig(
        model_type="bsarec", item_size=data.corpus.item_size,
        num_users=data.corpus.num_users + 1, max_seq_length=50,
        hidden_size=64, num_hidden_layers=2, num_attention_heads=1,
        c=5, alpha=0.7,
        hidden_dropout_prob=dropout, attention_probs_dropout_prob=dropout,
    )
    tr = Trainer(cfg, TrainConfig(lr=5e-4, batch_size=256, seed=42, scan_unroll=unroll),
                 data, logger, "/tmp/sweep.ckpt")
    tr.train(0)  # compile
    t0 = time.time()
    for e in range(1, 4):
        tr.train(e)
    return 3 * data.train.num_samples / (time.time() - t0)


def main() -> None:
    # serialize against other heavy jobs (wedge-proofing, CLAUDE.md)
    from bsarec_tpu.utils.heavylock import acquire

    acquire("step_sweep.py")

    parser = argparse.ArgumentParser()
    parser.add_argument("--lever", default="unroll",
                        choices=("unroll", "dropout", "component"))
    parser.add_argument("--unrolls", default="2,4,8")
    parser.add_argument(
        "--strategies", default="threshold,pallas,u8,u8direct,bernoulli,bits",
        help="dropout lever only: comma list of mask strategies to time")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    from bsarec_tpu.data.corpus import load_corpus
    from bsarec_tpu.data.pipeline import SeqRecData

    data = SeqRecData(load_corpus("/root/reference/src/data/Beauty.txt"), max_len=50)

    results: dict[str, float] = {}
    if args.lever == "unroll":
        for unroll in (int(u) for u in args.unrolls.split(",")):
            results[str(unroll)] = round(run_point(data, unroll), 1)
            print(unroll, results[str(unroll)], flush=True)
    elif args.lever == "component":
        # full masks vs RNG-free masks vs no dropout, same unroll: the
        # ex/s deltas convert to per-step µs and attribute the gap
        # between the parity config and the no-dropout ceiling
        batch = 256
        for name, strat, rate in (("full", "threshold", 0.5),
                                  ("genfree", "iota", 0.5),
                                  ("off", "threshold", 0.0)):
            os.environ["BSAREC_DROPOUT"] = strat
            results[name] = round(run_point(data, 8, dropout=rate), 1)
            print(name, results[name], flush=True)
        us = {k: 1e6 * batch / v for k, v in results.items()}  # µs/step
        results["us_per_step"] = {k: round(v, 1) for k, v in us.items()}
        results["attribution_us"] = {
            "mask_generation": round(us["full"] - us["genfree"], 1),
            "mask_apply": round(us["genfree"] - us["off"], 1),
        }
    else:
        # strategy is read at trace time, so flipping the env var between
        # points retraces with the new mask construction
        for strat in args.strategies.split(","):
            os.environ["BSAREC_DROPOUT"] = strat
            results[strat] = round(run_point(data, 8), 1)
            print(strat, results[strat], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
