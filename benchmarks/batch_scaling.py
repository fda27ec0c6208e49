"""Throughput vs batch size / dtype on the Beauty parity config.

The parity config (B=256, d=64, L=50) runs ~5 TFLOP/s — single-digit
MFU: steps are small-op/VPU-bound, which is why bf16 does not move it.
This sweep shows where the chip's headroom is: throughput at larger
global batches (training semantics change with B — these rows are
capability numbers, not parity runs).

Usage: python benchmarks/batch_scaling.py [--batches 256,512,1024,2048]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # serialize against other heavy jobs (wedge-proofing, CLAUDE.md)
    from bsarec_tpu.utils.heavylock import acquire

    acquire("batch_scaling.py")

    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", default="256,1024,2048")
    parser.add_argument("--dtypes", default="float32,bfloat16")
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument(
        "--prng", default="rbg", choices=("rbg", "threefry"),
        help="rbg matches the shipped FastDropout defaults (bench.py); "
        "threefry reproduces the reference-parity RNG stream")
    args = parser.parse_args()

    if args.prng == "rbg":
        import jax

        jax.config.update("jax_default_prng_impl", "rbg")

    from bsarec_tpu.config import ModelConfig, TrainConfig
    from bsarec_tpu.data.corpus import load_corpus
    from bsarec_tpu.data.pipeline import SeqRecData
    from bsarec_tpu.train.trainer import Trainer

    logger = logging.getLogger("scaling")
    logger.addHandler(logging.NullHandler())
    logger.propagate = False

    corpus = load_corpus("/root/reference/src/data/Beauty.txt")
    data = SeqRecData(corpus, max_len=50)
    for dtype in args.dtypes.split(","):
        for b in (int(x) for x in args.batches.split(",")):
            model_cfg = ModelConfig(
                model_type="bsarec", item_size=corpus.item_size,
                num_users=corpus.num_users + 1, max_seq_length=50,
                hidden_size=64, num_hidden_layers=2, num_attention_heads=1,
                c=5, alpha=0.7, compute_dtype=dtype,
            )
            train_cfg = TrainConfig(lr=5e-4, batch_size=b, seed=42)
            trainer = Trainer(model_cfg, train_cfg, data, logger, "/tmp/scal.ckpt")
            trainer.train(0)  # compile
            t0 = time.time()
            for e in range(1, 1 + args.epochs):
                trainer.train(e)
            dt = time.time() - t0
            rate = args.epochs * data.train.num_samples / dt
            # fwd FLOPs/example: 2 layers x (qkvo + attn + ffn) + CE
            # logits; train step ~ 3x fwd
            L, d, V = 50, 64, corpus.item_size
            fwd = 2 * (2 * L * 4 * d * d + 4 * L * L * d + 2 * L * 8 * d * d) + 2 * V * d
            flops = 3 * fwd * rate
            print(
                json.dumps(
                    {
                        "metric": "train_examples_per_sec",
                        "value": round(rate, 1),
                        "unit": "examples/s",
                        "batch": b,
                        "dtype": dtype,
                        "approx_model_tflops": round(flops / 1e12, 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
