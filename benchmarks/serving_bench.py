"""Serving-path catalog ranking benchmark: fp32 vs bf16 vs int8.

Times the dense serving ranking (`bsarec_tpu/serving.py` semantics:
state x table logits -> seen-mask -> top-20) at catalog scale in the
three matmul precisions the exported scorer supports. The encoder
forward is excluded on purpose: at serving batch sizes the [b, h] x
[V, h] catalog product dominates, and it is the part `--serving_quant`
changes. The reference has no serving path to compare against
(host-side numpy eval, `src/trainers.py:142-149`).

Timing methodology: chained data-dependent iterations inside one jit
with forced host readback, regressed over two chain lengths — see
`benchmarks/large_catalog.py` (per-dispatch timings are unreliable on
this tunnel). The top-1 ranked score feeds the next iteration's state
nonlinearly so XLA cannot collapse the chain.

Usage:
    python benchmarks/serving_bench.py [--items 1000000] [--hidden 64]
        [--batch 256] [--variants f32,bf16,int8]

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
from bsarec_tpu.serving import int8_logits_prequant, quantize_rows


def make_chain(score, k_iters):
    """k chained rank iterations; the winner's score perturbs the next
    state nonlinearly (no CSE), only top-k values/ids leave the loop."""

    def run(state, *score_args):
        def body(s, _):
            vals, idx = masked_topk(score(s, *score_args), seen)
            s = s + 1e-4 * jnp.tanh(vals[:, :1])
            return s, (vals[:, 0], idx[:, 0])
        final, (v, i) = jax.lax.scan(body, state, None, length=k_iters)
        return jnp.sum(v) + jnp.sum(i) + jnp.sum(final)

    return run


def chain_ms(score, state, score_args, ks=(2, 12)):
    ts = []
    for k in ks:
        f = jax.jit(make_chain(score, k))
        float(f(state, *score_args))  # compile + warm
        t0 = time.time()
        float(f(state, *score_args))
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
    ap.add_argument("--variants", default="f32,bf16,int8")
    args = ap.parse_args()

    B, V, H = args.batch, args.items, args.hidden
    global seen  # read inside make_chain's body
    kt, ks_, kn = jax.random.split(jax.random.PRNGKey(0), 3)
    # generated on device: a 10M x 256 host array would be 10 GB + tunnel
    table = jax.jit(lambda k: jax.random.normal(k, (V, H), jnp.float32))(kt)
    state = jax.jit(lambda k: jax.random.normal(k, (B, H), jnp.float32))(ks_)
    seen = jax.jit(
        lambda k: jax.random.randint(k, (B, args.seen), 0, V, jnp.int32)
    )(kn)

    variants = {}
    if "f32" in args.variants:
        variants["f32"] = (
            lambda s, t: jnp.einsum("bh,vh->bv", s, t,
                                    preferred_element_type=jnp.float32),
            (table,),
        )
    if "bf16" in args.variants:
        tb = table.astype(jnp.bfloat16)
        variants["bf16"] = (
            lambda s, t: jnp.einsum("bh,vh->bv", s.astype(jnp.bfloat16), t,
                                    preferred_element_type=jnp.float32),
            (tb,),
        )
    if "int8" in args.variants:
        q_table, t_scale = jax.jit(quantize_rows)(table)
        variants["int8"] = (int8_logits_prequant, (q_table, t_scale))

    for name, (score, score_args) in variants.items():
        ms = chain_ms(score, state, score_args)
        print(json.dumps({
            "metric": f"serving_rank_{name}", "value": round(ms, 3),
            "unit": "ms/iter", "items": V, "hidden": H, "batch": B,
            "users_per_sec": round(B / ms * 1e3) if ms > 0 else None,
        }))


if __name__ == "__main__":
    main()
