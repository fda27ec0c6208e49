"""Serving-path catalog ranking benchmark: dense vs chunked, fp32 vs
bf16 vs int8, plus a stage decomposition of the dense path.

Times the serving ranking (`bsarec_tpu/serving.py` semantics: state x
table logits -> seen-mask -> top-20) at catalog scale. The encoder
forward is excluded on purpose: at serving batch sizes the [b, h] x
[V, h] catalog product plus the [b, V] slab handling dominates, and
those are the parts `--serving_quant` / `--serving_impl` change. The
reference has no serving path to compare against (host-side numpy
eval, `src/trainers.py:142-149`).

Variant families:
  f32 / bf16 / int8             dense: full [b, V] logits slab + top_k
  *_chunked                     `chunked_masked_topk`: per-chunk top-k
                                over --item_chunk blocks + final merge
  stage_matmul / stage_mask /   dense path truncated after each stage
  stage_topk                    (deltas attribute the dense cost; the
                                matmul/mask rows end in a max-reduce to
                                stay data-dependent, so each delta is
                                stage-cost minus one [b,V] read)

Timing methodology: chained data-dependent iterations inside one jit
with forced host readback, regressed over two chain lengths — see
`benchmarks/large_catalog.py` (per-dispatch timings are unreliable on
this tunnel). The top-1 ranked score feeds the next iteration's state
nonlinearly so XLA cannot collapse the chain.

Usage:
    python benchmarks/serving_bench.py [--items 1000000] [--hidden 64]
        [--batch 256] [--item_chunk 65536]
        [--variants f32,bf16,int8,f32_chunked,bf16_chunked,int8_chunked,stages]

Prints one JSON line per variant.
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

from bsarec_tpu.ops.topk import masked_topk
from bsarec_tpu.serving import (
    bitmask_masked_topk,
    chunked_masked_topk,
    filtered_masked_topk,
    int8_logits_prequant,
    quantize_rows,
)


def make_chain(rank, k_iters):
    """k chained rank iterations; the winner's score perturbs the next
    state nonlinearly (no CSE), only top-k values/ids leave the loop."""

    def run(state):
        def body(s, _):
            vals, idx = rank(s)
            s = s + 1e-4 * jnp.tanh(vals[:, :1])
            return s, (vals[:, 0], idx[:, 0])
        final, (v, i) = jax.lax.scan(body, state, None, length=k_iters)
        return jnp.sum(v) + jnp.sum(i) + jnp.sum(final)

    return run


def chain_ms(rank, state, ks=(2, 12)):
    ts = []
    for k in ks:
        f = jax.jit(make_chain(rank, k))
        float(f(state))  # compile + warm
        t0 = time.time()
        float(f(state))
        ts.append(time.time() - t0)
    return (ts[1] - ts[0]) / (ks[1] - ks[0]) * 1e3


def main():
    # serialize against other heavy jobs (wedge-proofing, CLAUDE.md)
    from bsarec_tpu.utils.heavylock import acquire

    acquire("serving_bench.py")

    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seen", type=int, default=50)
    ap.add_argument("--item_chunk", type=int, default=65536)
    ap.add_argument(
        "--variants",
        default="f32,bf16,int8,f32_bitmask,bf16_bitmask,int8_bitmask,"
        "f32_chunked,bf16_chunked,int8_chunked,stages")
    args = ap.parse_args()

    B, V, H, IC = args.batch, args.items, args.hidden, args.item_chunk
    kt, ks_, kn = jax.random.split(jax.random.PRNGKey(0), 3)
    # generated on device: a 10M x 256 host array would be 10 GB + tunnel
    table = jax.jit(lambda k: jax.random.normal(k, (V, H), jnp.float32))(kt)
    state = jax.jit(lambda k: jax.random.normal(k, (B, H), jnp.float32))(ks_)
    seen = jax.jit(
        lambda k: jax.random.randint(k, (B, args.seen), 0, V, jnp.int32)
    )(kn)
    tb = table.astype(jnp.bfloat16)
    q_table, t_scale = jax.jit(quantize_rows)(table)
    batch_ix = jnp.arange(B)[:, None]

    def dense_rank(score, *score_args):
        return lambda s: masked_topk(score(s, *score_args), seen)

    def f32_mm(s, t):
        return jnp.einsum("bh,vh->bv", s, t, preferred_element_type=jnp.float32)

    def bf16_mm(s, t):
        return jnp.einsum("bh,vh->bv", s.astype(jnp.bfloat16), t,
                          preferred_element_type=jnp.float32)

    variants = {}
    want = set(args.variants.split(","))
    if "f32" in want:
        variants["f32"] = dense_rank(f32_mm, table)
    if "bf16" in want:
        variants["bf16"] = dense_rank(bf16_mm, tb)
    if "int8" in want:
        variants["int8"] = dense_rank(int8_logits_prequant, q_table, t_scale)
    def filtered_rank(score, *score_args):
        return lambda s: filtered_masked_topk(score(s, *score_args), seen)

    def bitmask_rank(score, *score_args):
        return lambda s: bitmask_masked_topk(score(s, *score_args), seen)

    if "f32_bitmask" in want:
        variants["f32_bitmask"] = bitmask_rank(f32_mm, table)
    if "bf16_bitmask" in want:
        variants["bf16_bitmask"] = bitmask_rank(bf16_mm, tb)
    if "int8_bitmask" in want:
        variants["int8_bitmask"] = bitmask_rank(
            int8_logits_prequant, q_table, t_scale)
    if "f32_bitmask_gather" in want:
        # documented negative: gather-expanding the bitmask does not
        # fuse into the masking where (14.0 vs 7.9 ms at 1M x 64)
        def bitmask_gather_rank(s):
            logits = f32_mm(s, table)
            nw = (V + 31) // 32
            sd = jnp.sort(seen, axis=1)
            dup = jnp.concatenate(
                [jnp.zeros((B, 1), bool), sd[:, 1:] == sd[:, :-1]], axis=1)
            sd = jnp.where(dup, 0, sd)
            word = jnp.where(sd > 0, sd // 32, nw)
            contrib = jnp.where(
                sd > 0, jnp.uint32(1) << (sd % 32).astype(jnp.uint32),
                jnp.uint32(0))
            rows = jnp.broadcast_to(jnp.arange(B)[:, None], sd.shape)
            bm = jnp.zeros((B, nw + 1), jnp.uint32).at[rows, word].add(
                contrib)[:, :nw]
            cols = jnp.arange(V, dtype=jnp.int32)
            is_seen = (bm[:, cols // 32] >> (cols % 32).astype(jnp.uint32)) & 1
            masked = jnp.where((is_seen == 1) | (cols[None, :] == 0),
                               -jnp.inf, logits)
            return jax.lax.top_k(masked, 20)

        variants["f32_bitmask_gather"] = bitmask_gather_rank

    if "f32_filtered" in want:
        variants["f32_filtered"] = filtered_rank(f32_mm, table)
    if "bf16_filtered" in want:
        variants["bf16_filtered"] = filtered_rank(bf16_mm, tb)
    if "int8_filtered" in want:
        variants["int8_filtered"] = filtered_rank(
            int8_logits_prequant, q_table, t_scale)
    if "f32_chunked" in want:
        variants["f32_chunked"] = lambda s: chunked_masked_topk(
            s, (table,), lambda st, t: f32_mm(st, t), seen, V, item_chunk=IC)
    if "bf16_chunked" in want:
        variants["bf16_chunked"] = lambda s: chunked_masked_topk(
            s, (tb,), lambda st, t: bf16_mm(st, t), seen, V, item_chunk=IC)
    if "int8_chunked" in want:
        def int8_lf(pack, qt, ts):
            qs, ss = pack
            acc = jax.lax.dot_general(
                qs, qt, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * ss[:, None] * ts[None, :]

        variants["int8_chunked"] = lambda s: chunked_masked_topk(
            quantize_rows(s), (q_table, t_scale), int8_lf, seen, V,
            item_chunk=IC)
    if "stages" in want:
        def stage(kind):
            def rank(s):
                logits = f32_mm(s, table)
                if kind != "matmul":
                    logits = logits.at[batch_ix, seen].set(0.0)
                if kind == "topk":
                    return jax.lax.top_k(logits, 20)
                v = jnp.max(logits, axis=1, keepdims=True)
                return v, jnp.zeros((B, 1), jnp.int32)
            return rank

        for kind in ("matmul", "mask", "topk"):
            variants[f"stage_{kind}"] = stage(kind)

    for name, rank in variants.items():
        ms = chain_ms(rank, state)
        print(json.dumps({
            "metric": f"serving_rank_{name}", "value": round(ms, 3),
            "unit": "ms/iter", "items": V, "hidden": H, "batch": B,
            "item_chunk": IC if "chunked" in name else None,
            "users_per_sec": round(B / ms * 1e3) if ms > 0 else None,
        }), flush=True)


if __name__ == "__main__":
    main()
