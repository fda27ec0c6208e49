"""Long-sequence stress benchmark (BASELINE config #3 shape).

maxlen=200 / 4 layers / d=128 — the `repo-b/parse.py:11` default shape
that stresses the [L, L] frequency matmuls (200x200), FEARec's band
matrices and the L^2 attention. ML-1M (the reference dataset with these
sequence lengths) is stripped from this mount, so the corpus is
synthetic with the same shape statistics; throughput and numerical
health (finite losses) are the measurements.

Usage: python benchmarks/longseq.py [--models bsarec,fearec,fmlprec]
Prints one JSON line per model.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthetic_long_corpus(n_users=3000, n_items=3500, seed=0):
    # NOTE: n_users=8000 (~1.36M prefix-expanded samples, a ~1.1 GB
    # HBM-resident input array) reproducibly crashes this environment's
    # TPU worker ("kernel fault") inside the epoch scan, while a single
    # jitted step at the same shapes and the same epoch at <=~0.5M
    # samples run fine — an XLA/runtime limit, not a framework one
    # (--multihost exists precisely to keep the dataset off-HBM).
    from bsarec_tpu.data.corpus import Corpus

    rng = np.random.default_rng(seed)
    seqs = []
    for _ in range(n_users):
        # ML-1M-like: long histories, many > maxlen
        n = int(rng.integers(25, 320))
        seqs.append([int(x) for x in rng.integers(1, n_items, size=n)])
    return Corpus(user_seq=seqs, max_item=n_items)


def main():
    # serialize against other heavy jobs (wedge-proofing, CLAUDE.md)
    from bsarec_tpu.utils.heavylock import acquire

    acquire("longseq.py")

    parser = argparse.ArgumentParser()
    parser.add_argument("--models", default="bsarec,fearec,fmlprec")
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--dtype", default="float32")
    parser.add_argument("--users", type=int, default=3000)
    parser.add_argument(
        "--multihost", action="store_true",
        help="host-fed pipeline: the dataset stays off-HBM, which also "
        "sidesteps the large-resident-dataset TPU-worker fault above",
    )
    args = parser.parse_args()

    from bsarec_tpu.config import ModelConfig, TrainConfig
    from bsarec_tpu.data.pipeline import SeqRecData
    from bsarec_tpu.train.trainer import Trainer

    logger = logging.getLogger("longseq")
    logger.addHandler(logging.NullHandler())
    logger.propagate = False

    corpus = synthetic_long_corpus(n_users=args.users)
    data = SeqRecData(corpus, max_len=200)

    for model in args.models.split(","):
        model_cfg = ModelConfig(
            model_type=model, item_size=corpus.item_size,
            num_users=corpus.num_users + 1, max_seq_length=200,
            hidden_size=128, num_hidden_layers=4, num_attention_heads=2,
            c=9, alpha=0.7, compute_dtype=args.dtype,
        )
        # unroll=1 + remat: the L=200 4-layer contrastive models
        # (FEARec trains 3 forwards/step) crash the worker with an
        # unrolled epoch scan (unrolling multiplies peak residual
        # memory; the throughput-tuned default is 8 — config.py); remat
        # caps residual memory at the cost of a forward recompute
        train_cfg = TrainConfig(
            lr=1e-3, batch_size=256, seed=0, multihost=args.multihost,
            scan_unroll=1, remat=model in ("fearec", "duorec"),
        )
        trainer = Trainer(model_cfg, train_cfg, data, logger, "/tmp/longseq.ckpt")
        losses = [trainer.train(0)]  # compile epoch
        t0 = time.time()
        for e in range(1, 1 + args.epochs):
            losses.append(trainer.train(e))
        dt = time.time() - t0
        t0e = time.time()
        scores, _ = trainer.valid(0)
        eval_s = time.time() - t0e
        print(
            json.dumps(
                {
                    "metric": "longseq_train_examples_per_sec",
                    "model": model,
                    "value": round(args.epochs * data.train.num_samples / dt, 1),
                    "unit": "examples/s",
                    "maxlen": 200, "layers": 4, "hidden": 128,
                    "dtype": args.dtype, "multihost": args.multihost,
                    "train_samples": data.train.num_samples,
                    "final_loss": round(float(losses[-1]), 4),
                    "loss_decreasing": bool(losses[-1] < losses[0]),
                    "eval_seconds": round(eval_s, 2),
                    "hr10": round(scores[2], 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
