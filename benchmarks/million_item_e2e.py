"""End-to-end training + full-catalog eval on a synthetic 1M-item catalog.

`large_catalog.py` times the streaming kernels in isolation; this runs
the REAL `Trainer` — whole-epoch jitted scan, on-device rejection
negatives, streaming softmax-CE loss (`ops/pallas_ce.py`), Adam,
checkpointing surface, and the streaming masked top-k eval
(`ops/pallas_rank.py`) — at a catalog size the reference cannot touch
(its loss/eval materialize [B, V]: `src/model/bsarec.py:33-35`,
`src/trainers.py:126-149`).

Each epoch is one jitted scan whose `float(loss)` readback gates the
next dispatch, so wall-clock across epochs is trustworthy on the axon
tunnel (CLAUDE.md timing rule).

Usage:
    python benchmarks/million_item_e2e.py [--items 1000000 --users 50000]
    python benchmarks/million_item_e2e.py --smoke   # tiny CPU sanity run

Prints one JSON line with train ex/s, eval users/s and the loss curve.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --smoke runs must survive a wedged TPU relay (CLAUDE.md)
import bsarec_tpu.cpu_guard  # noqa: F401  (must precede any backend use)
import numpy as np


def synth_corpus(n_users: int, n_items: int, seed: int = 0):
    """Learnable structure at scale: each user walks a random arithmetic
    progression through the catalog (so next-item is predictable from
    history), lengths 8-16."""
    from bsarec_tpu.data.corpus import Corpus

    rng = np.random.default_rng(seed)
    lens = rng.integers(8, 17, size=n_users)
    starts = rng.integers(1, n_items, size=n_users)
    strides = rng.integers(1, 7, size=n_users)
    offsets = np.zeros(n_users + 1, np.int32)
    np.cumsum(lens, out=offsets[1:])
    pos = np.arange(int(offsets[-1]), dtype=np.int64)
    user_of = np.repeat(np.arange(n_users), lens)
    within = pos - offsets[user_of]
    items = (starts[user_of] + strides[user_of] * within - 1) % (n_items - 1) + 1
    return Corpus(
        user_seq=None, max_item=n_items - 1,
        offsets=offsets, items=items.astype(np.int32),
    )


def main():
    # serialize against other heavy jobs (wedge-proofing, CLAUDE.md)
    from bsarec_tpu.utils.heavylock import acquire

    acquire("million_item_e2e.py")

    parser = argparse.ArgumentParser()
    parser.add_argument("--items", type=int, default=1_000_000)
    parser.add_argument("--users", type=int, default=50_000)
    parser.add_argument("--hidden", type=int, default=64)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--dtype", default="float32", choices=("float32", "bfloat16"))
    parser.add_argument(
        "--smoke", action="store_true",
        help="tiny shapes + dense impls: CPU sanity run of this script",
    )
    args = parser.parse_args()
    if args.smoke:
        args.items, args.users, args.epochs = 2_000, 800, 1

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    from bsarec_tpu.config import ModelConfig, TrainConfig
    from bsarec_tpu.data.pipeline import SeqRecData
    from bsarec_tpu.train.trainer import Trainer

    logger = logging.getLogger("m1e2e")
    logger.addHandler(logging.NullHandler())
    logger.propagate = False

    corpus = synth_corpus(args.users, args.items)
    data = SeqRecData(corpus, max_len=50)
    model_cfg = ModelConfig(
        model_type="bsarec", item_size=corpus.item_size,
        num_users=corpus.num_users + 1, max_seq_length=50,
        hidden_size=args.hidden, num_hidden_layers=2, num_attention_heads=1,
        c=5, alpha=0.7, compute_dtype=args.dtype,
    )
    train_cfg = TrainConfig(lr=5e-4, batch_size=args.batch, seed=42)
    trainer = Trainer(
        model_cfg, train_cfg, data, logger, "/tmp/million_e2e.ckpt"
    )
    print(
        f"# {args.items} items, {args.users} users, "
        f"{data.train.num_samples} train samples; loss_impl="
        f"{trainer.model_cfg.loss_impl}, eval_impl={trainer.eval_impl}",
        flush=True,
    )

    losses = [trainer.train(0)]  # compile epoch
    t0 = time.time()
    for e in range(1, 1 + args.epochs):
        losses.append(trainer.train(e))
    ex_per_sec = args.epochs * data.train.num_samples / (time.time() - t0)

    trainer.valid(0)  # compile
    t0 = time.time()
    trainer.valid(0)
    users_per_sec = data.valid.num_users / (time.time() - t0)

    print(json.dumps({
        "metric": "million_item_e2e",
        "items": args.items,
        "train_examples_per_sec": round(ex_per_sec, 1),
        "eval_users_per_sec": round(users_per_sec, 1),
        "losses": [round(l, 4) for l in losses],
        "dtype": args.dtype,
    }))


if __name__ == "__main__":
    main()
