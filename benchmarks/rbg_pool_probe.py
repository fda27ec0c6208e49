"""Probe: is per-call RngBitGenerator overhead the remaining dropout
cost? (VERDICT r4 item 5.)

The r4 decomposition (`results/r4_runs/sweep_component.log`) put the
gap to the no-dropout ceiling at ~80 us/step of rbg mask GENERATION
across the Beauty step's 8 dropout sites. The untried lever: ONE
RngBitGenerator call per step emitting all sites' bits, sliced per
site — amortizing per-call overhead without changing HBM traffic.

Variants, each applying 8 threshold-compare dropout masks to a chained
carry (so iterations are sequentially dependent — see CLAUDE.md: never
trust per-dispatch timings on the axon tunnel; ms/iter comes from
chained-jit regression over two chain lengths):

  multi   8 bits() calls per iter (today's threshold strategy)
  pooled  1 bits() call of the summed size, 8 static slices
  iota    RNG-free deterministic masks (apply-only floor)

ms/iter(multi) - ms/iter(pooled) isolates 7 saved RngBitGenerator
dispatches; ms/iter(pooled) - ms/iter(iota) is irreducible mask-apply.

Usage: python benchmarks/rbg_pool_probe.py [--batch 256 --len 50 --hidden 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.large_catalog import chain_rate

# the Beauty step's 8 mask sites: embedding dropout + per layer
# (2 layers): freq-layer, attn-probs, attn-out, FFN-out — approximated
# here as 8 equal [B, L, H] sites (attn-probs is [B, 1, L, L] = same
# order of elements at H=64, L=50)
N_SITES = 8


def make_variant(variant: str, k: int, shape):
    t = jnp.uint32(1 << 31)  # p = 0.5 threshold
    n = 1
    for d in shape:
        n *= d

    def masks_multi(key):
        return [
            jax.random.bits(jax.random.fold_in(key, s), shape, jnp.uint32) >= t
            for s in range(N_SITES)
        ]

    def masks_pooled(key):
        pool = jax.random.bits(key, (N_SITES * n,), jnp.uint32)
        return [
            (pool[s * n : (s + 1) * n] >= t).reshape(shape)
            for s in range(N_SITES)
        ]

    def masks_iota(key):
        del key
        idx = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
        return [((idx & 1) == (s & 1)) for s in range(N_SITES)]

    masks = {"multi": masks_multi, "pooled": masks_pooled, "iota": masks_iota}[variant]

    def fn(x, key):
        for i in range(k):
            key = jax.random.fold_in(key, i)
            for s, keep in enumerate(masks(key)):
                x = jax.lax.select(keep, x * 2.0, jnp.zeros_like(x))
            x = jnp.tanh(x) + 1.0  # nonlinear dependence between iters
        return x

    return fn


def main():
    from bsarec_tpu.utils.heavylock import acquire

    acquire("rbg_pool_probe.py")

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--len", dest="seqlen", type=int, default=50)
    p.add_argument("--hidden", type=int, default=64)
    args = p.parse_args()

    jax.config.update("jax_default_prng_impl", "rbg")
    shape = (args.batch, args.seqlen, args.hidden)
    x = jnp.ones(shape, jnp.float32)
    key = jax.random.PRNGKey(0)

    out = {"shape": list(shape), "sites": N_SITES,
           "backend": jax.default_backend()}
    for variant in ("iota", "pooled", "multi"):
        ms = chain_rate(lambda k, v=variant: make_variant(v, k, shape), (x, key))
        out[f"ms_{variant}"] = round(ms, 4)
        print(f"{variant}: {ms * 1e3:.1f} us/iter", flush=True)
    out["us_saved_by_pooling"] = round((out["ms_multi"] - out["ms_pooled"]) * 1e3, 1)
    out["us_apply_floor"] = round(out["ms_iota"] * 1e3, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
