"""Production-scale catalog benchmark: streaming kernels at 1M-10M items.

The reference caps out at ~20k-item catalogs (Yelp) because its training
loss and eval both materialize [B, V] score matrices (`src/model/
bsarec.py:33-35`, `src/trainers.py:126-149`). This benchmark exercises the
TPU-native streaming kernels (`bsarec_tpu/ops/pallas_ce.py`,
`pallas_rank.py`) on synthetic catalogs far beyond that — the regime this
framework targets for production serving.

Timing methodology (IMPORTANT): on this environment, per-dispatch
wall-clock timings are unreliable (`jax.block_until_ready` can return
before device completion behind the remote-execution tunnel). All numbers
here chain k data-dependent iterations inside one jit, force a host
readback, and regress total time over two k values — this cancels the
fixed ~28 ms dispatch+readback round trip and defeats constant folding.

Usage:
    python benchmarks/large_catalog.py [--items 1000000] [--batch 256]

Prints one JSON line per metric.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain_rate(make_fn, args, ks=(2, 12)):
    """ms per iteration via chained-jit regression (see module docstring)."""
    ts = []
    for k in ks:
        f = jax.jit(make_fn(k))
        float(jnp.sum(f(*args)))  # compile + warm
        t0 = time.time()
        float(jnp.sum(f(*args)))
        ts.append(time.time() - t0)
    return (ts[1] - ts[0]) / (ks[1] - ks[0]) * 1e3


def main():
    # serialize against other heavy jobs (wedge-proofing, CLAUDE.md)
    from bsarec_tpu.utils.heavylock import acquire

    acquire("large_catalog.py")

    parser = argparse.ArgumentParser()
    parser.add_argument("--items", type=int, default=1_000_000)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--hidden", type=int, default=64)
    parser.add_argument("--seen", type=int, default=50)
    parser.add_argument(
        "--metrics", default="fwd,step,rank",
        help="comma list of fwd,step,rank (10M x 256 fp32 cannot hold the "
        "10 GB dtable next to the 10 GB table single-chip: that shape "
        "exists for the 2-host vocab-sharded mesh; measure fwd/rank)",
    )
    parser.add_argument(
        "--dtype", default="f32", choices=("f32", "bf16"),
        help="table/state storage dtype (bf16 halves HBM + doubles MXU rate; "
        "all reductions stay f32 in-kernel)",
    )
    args = parser.parse_args()

    from bsarec_tpu.ops.pallas_ce import streaming_softmax_ce
    from bsarec_tpu.ops.pallas_rank import build_seen_bitmask, streaming_masked_topk

    B, V, H = args.batch, args.items, args.hidden
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    # the table is generated ON DEVICE: at 10M x 256 the host-side
    # array would be 10 GB of RAM + a multi-minute tunnel transfer
    kt, ks = jax.random.split(jax.random.PRNGKey(0))
    states = jax.jit(
        lambda k: jax.random.normal(k, (B, H), jnp.float32).astype(dt)
    )(ks)
    table = jax.jit(  # fused: one output buffer, no 10 GB temporaries
        lambda k: (jax.random.normal(k, (V, H), jnp.float32) * 0.1).astype(dt)
    )(kt)
    jax.block_until_ready(table)
    answers = jnp.asarray(rng.integers(1, V, size=B).astype(np.int32))
    if V <= 2_000_000:
        bitmask = jnp.asarray(
            build_seen_bitmask(rng.integers(1, V, size=(B, args.seen)).astype(np.int32), V)
        )
    else:
        # avoid a 100s-scale host->device transfer of the [B, V/32] mask
        # over the tunnel: an all-zeros device-side mask keeps the
        # kernel's expansion/masking work identical (a handful of seen
        # bits only changes the rare counted-merge rounds)
        vp = -(-V // 4096) * 4096
        bitmask = jnp.zeros((B, vp // 32), jnp.int32)

    def ce_fwd(k):
        def g(s0, tbl, ans):
            def body(carry, _):
                s, tot = carry
                tot = tot + jnp.mean(streaming_softmax_ce(s, tbl, ans))
                s = (jnp.abs(s) * 0.999 + tot * 1e-9).astype(s0.dtype)
                return (s, tot), None

            return jax.lax.scan(body, (s0, 0.0), None, length=k)[0][1]

        return g

    def ce_step(k):
        def g(s0, tbl, ans):
            def body(carry, _):
                s, t, tot = carry
                gs, gt = jax.grad(
                    lambda ss, tt: jnp.mean(streaming_softmax_ce(ss, tt, ans)),
                    argnums=(0, 1),
                )(s, t)
                tot = tot + jnp.sum(jnp.abs(gs))
                s = (jnp.abs(s) * 0.999 + tot * 1e-9).astype(s0.dtype)
                return (s, (t + gt * 1e-6).astype(tbl.dtype), tot), None

            return jax.lax.scan(body, (s0, tbl, 0.0), None, length=k)[0][2]

        return g

    def rank(k):
        def g(s0, tbl, bm):
            def body(carry, _):
                s, tot = carry
                vals, _ = streaming_masked_topk(s, tbl, bm, k=20, n_valid=V)
                tot = tot + jnp.sum(vals)
                s = (jnp.abs(s) * 0.999 + tot * 1e-9).astype(s0.dtype)
                return (s, tot), None

            return jax.lax.scan(body, (s0, 0.0), None, length=k)[0][1]

        return g

    want = set(args.metrics.split(","))
    rows = []
    if "fwd" in want:
        fwd_ms = chain_rate(ce_fwd, (states, table, answers))
        rows.append(("streaming_ce_forward", fwd_ms, "ms"))
    if "step" in want:
        step_ms = chain_rate(ce_step, (states, table, answers), ks=(2, 8))
        rows.append(("streaming_ce_train_step", step_ms, "ms"))
        rows.append(("train_examples_per_sec_at_catalog", B / (step_ms / 1e3), "examples/s"))
    if "rank" in want:
        rank_ms = chain_rate(rank, (states, table, bitmask))
        rows.append(("streaming_rank_sweep", rank_ms, "ms"))
        rows.append(("ranked_users_per_sec_at_catalog", B / (rank_ms / 1e3), "users/s"))

    for metric, value, unit in rows:
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": round(value, 2),
                    "unit": unit,
                    "items": V,
                    "batch": B,
                    "hidden": H,
                    "dtype": args.dtype,
                }
            )
        )


if __name__ == "__main__":
    main()
