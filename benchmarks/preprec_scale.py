"""PREPRec full-catalog eval at production scale (VERDICT r4 item 1
"Done" criterion): eval_method 3 on a synthetic 100k-user x 1M-item
corpus in bounded memory.

Before round 5, `preprec/evaluate.py` materialized [U, V+1] int32
candidates plus two same-shape time arrays on host AND device — at this
shape that is 3 x 400 GB, i.e. impossible. The streaming sweep
(implicit [gt] + arange candidates, `eval_item_chunk` blocks, rank
accumulated in-scan) holds only:

  host:   the [U, maxlen] history arrays (~80 MB here)
  device: popularity tables ([T+2, 11, V+1] + [T2, 6, V+1] f32,
          ~350 MB), the eval arrays, and one
          [eval_batch, eval_item_chunk, 39] feature tile (~100 MB at
          the defaults) — independent of U x V.

The model/tables are randomly initialized (quality is meaningless
here; the bench measures the eval sweep's throughput and that it runs
at all). Ranks are validated in [0, V] and the users/s rate is
reported from one timed jit call (a single dispatch covering all
users via the internal scan; np.asarray forces real completion).

Usage: python benchmarks/preprec_scale.py [--users 100000 --items 1000000
           --eval_batch 16 --item_chunk 8192 --maxlen 50]

--dispatch_users N splits the sweep into host-level blocks of N users,
one jit call per block (one shared compile). The monolithic
all-users-in-one-scan dispatch runs for minutes at this scale and has
twice faulted the tunneled TPU worker mid-execution even after the
OOB-id clamp (preprec_scale_20k.log, preprec_scale_20k_v2.log) —
identical HBM residency per block isolates dispatch *duration* as the
fault trigger.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bsarec_tpu.cpu_guard  # noqa: F401  (must precede any backend use)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bsarec_tpu.utils.heavylock import acquire

    acquire("preprec_scale.py")

    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--maxlen", type=int, default=50)
    ap.add_argument("--eval_batch", type=int, default=16)
    ap.add_argument("--item_chunk", type=int, default=8192)
    ap.add_argument("--hidden", type=int, default=50)
    ap.add_argument("--dispatch_users", type=int, default=0,
                    help="users per jit dispatch (0 = all in one scan)")
    ap.add_argument("--table_dtype", choices=["f32", "bf16"], default="f32",
                    help="popularity-table storage dtype (bf16 halves the "
                         "~500 MB of 1M-item table residency; features are "
                         "upcast after the gather)")
    args = ap.parse_args()

    from bsarec_tpu.preprec.config import PrepRecConfig, PrepRecTrainConfig
    from bsarec_tpu.preprec.data import PrepRecDataset
    from bsarec_tpu.preprec.evaluate import build_eval_inputs, make_eval_fn
    from bsarec_tpu.preprec.popularity import PopularityEncoding, PopularityTable
    from bsarec_tpu.preprec.train import PrepRecTrainer

    U, V, L = args.users, args.items, args.maxlen
    t1_size, t2_size = 5, 8
    rng = np.random.default_rng(0)
    ints = lambda lo, hi, shape: rng.integers(lo, hi, shape).astype(np.int32)  # noqa: E731

    cfg = PrepRecConfig(
        model="newrec", usernum=U, itemnum=V, maxlen=L,
        hidden_units=args.hidden, num_blocks=2, num_heads=1,
        dropout_rate=0.2, base_dim1=11, input_units1=33,
        base_dim2=6, input_units2=6, eval_method=3, topk=(10, 5, 1),
    )
    ds = PrepRecDataset(
        train_seq=ints(1, V + 1, (U, L + 1)),
        train_t1=ints(0, t1_size, (U, L + 1)),
        train_t2=ints(0, t2_size, (U, L + 1)),
        train_te=np.zeros((U, L), np.int32),
        valid_item=ints(1, V + 1, U),
        valid_t1=ints(0, t1_size, U), valid_t2=ints(0, t2_size, U),
        valid_te=np.zeros((U, L), np.int32),
        test_item=ints(1, V + 1, U),
        test_t1=ints(0, t1_size, U), test_t2=ints(0, t2_size, U),
        test_te=np.zeros((U, L), np.int32),
        seq_lens=np.full(U, L + 1, np.int32),
        usernum=U, itemnum=V,
    )
    # device-generated tables (a host [55, 1M] round trip is slow here)
    month = PopularityTable(
        jax.jit(lambda k: jax.random.uniform(
            k, (t1_size + 2, 11, V + 1), jnp.float32))(jax.random.PRNGKey(1)),
        11, 3,
    )
    week = PopularityTable(
        jax.jit(lambda k: jax.random.uniform(
            k, (t2_size, 6, V + 1), jnp.float32))(jax.random.PRNGKey(2)),
        6, 1,
    )
    pop = PopularityEncoding(month, week)

    tr = PrepRecTrainer(
        cfg, PrepRecTrainConfig(batch_size=256, seed=0,
                                eval_batch_size=args.eval_batch,
                                eval_item_chunk=args.item_chunk),
        ds, __import__("logging").getLogger("scale"), "/tmp/preprec_scale",
        pop_enc=pop, usernegs=None,
    )

    inputs = build_eval_inputs(ds, cfg, "valid", None)
    arrays = {
        k: jnp.asarray(getattr(inputs, k))
        for k in ("seqs", "t1", "t2", "te", "target", "cand_t1", "cand_t2", "users")
    }
    # tables as runtime args — baked-as-constants they exceed the remote
    # compiler's HLO upload limit at this scale (HTTP 413, round 5)
    arrays["pop_month"] = month.table
    arrays["pop_week"] = week.table
    D = args.dispatch_users or U
    n_blocks = -(-U // D)
    fn, steps = make_eval_fn(
        tr.model, cfg, pop, None, args.eval_batch, D, V,
        item_chunk=args.item_chunk,
    )
    print(f"# sweep: {n_blocks} dispatches x {steps} user batches x "
          f"{-(-V // args.item_chunk)} item chunks, "
          f"backend={jax.default_backend()}", flush=True)

    per_user = ("seqs", "t1", "t2", "te", "target", "cand_t1", "cand_t2",
                "users")

    def run(key):
        out = []
        for b in range(n_blocks):
            lo = b * D
            blk = dict(arrays)
            for k in per_user:
                sl = arrays[k][lo:lo + D]
                if sl.shape[0] < D:  # pad tail block (fn trims via safe idx,
                    # but shapes must match the compiled block size)
                    sl = jnp.concatenate(
                        [sl, jnp.repeat(sl[-1:], D - sl.shape[0], axis=0)])
                blk[k] = sl
            r = np.asarray(fn(tr.params, jax.random.fold_in(key, b), blk))
            out.append(r[: min(D, U - lo)])
            if b == 0:
                print(f"# block 0/{n_blocks} done at {time.time()-t0:.1f}s",
                      flush=True)
        return np.concatenate(out)

    t0 = time.time()
    ranks = run(jax.random.PRNGKey(3))
    wall = time.time() - t0  # includes one compile
    print(f"# first call (incl compile): {wall:.1f}s", flush=True)
    t0 = time.time()
    ranks = run(jax.random.PRNGKey(4))
    hot = time.time() - t0

    assert ranks.shape == (U,) and (ranks >= 0).all() and (ranks <= V).all()
    # random params + uniform tables -> ranks ~ Uniform[0, V): sanity
    print(json.dumps({
        "metric": "preprec_fullcatalog_eval", "users": U, "items": V,
        "eval_batch": args.eval_batch, "item_chunk": args.item_chunk,
        "dispatch_users": D,
        "first_call_s": round(wall, 1), "hot_call_s": round(hot, 1),
        "users_per_sec": round(U / hot, 1),
        "mean_rank_frac": round(float(ranks.mean()) / V, 3),
        "value": round(U / hot, 1), "unit": "users/s",
    }), flush=True)


if __name__ == "__main__":
    main()
