"""Fused dropout kernel: in-kernel hardware PRNG + threshold + apply.

Why this exists (round-4 attribution, `results/r4_runs/sweep_component.log`):
at the Beauty parity config dropout costs 125.9 µs of the 965.5 µs step —
80.3 µs generating rbg mask words, 45.6 µs applying them. Both halves are
HBM-traffic-bound, and most of that traffic is the mask itself: XLA's
`RngBitGenerator` is not a fusible elementwise op, so the threshold
strategy writes ~25 MB of random words per step and immediately reads
them back into the compare/select fusion. Generating the bits INSIDE a
Pallas kernel (`pltpu.prng_random_bits`) removes the mask array from HBM
entirely — each dropout site becomes one pass that reads x and writes the
masked x, the same traffic as a copy.

The backward pass needs the same mask. Instead of saving it (which would
reintroduce the traffic), the custom VJP saves only the two 32-bit seed
words and REGENERATES the mask in the cotangent kernel: Mosaic's PRNG is
deterministic in (seed, shape, block partition), and the partition depends
only on the (static) flat row count, so forward and backward see
bit-identical masks.

Semantics: iid Bernoulli(1-rate) keep mask, kept values scaled by
1/(1-rate) — the reference's `nn.Dropout(p)` distribution
(`/root/reference/src/model/_modules.py` dropout sites) on a Pallas PRNG
stream. Quality is stream-independent at this config: the round-4 Beauty
seed bands put threefry and rbg streams inside one variance band
(`results/r4_runs/beauty_seed_band.md`).

Layout rules honored (CLAUDE.md): the flat view is [rows, 128] full-lane
blocks, block rows are a divisor of the row count (no partial tiles, no
masked tail stores), scalars ride SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_MAX_BLOCK_ROWS = 1024  # 1024x128 f32 in+out = 1 MiB VMEM per block


def _block_rows(rows: int) -> int:
    """Largest multiple-of-8 divisor of `rows` up to _MAX_BLOCK_ROWS
    (full blocks only — the tail would otherwise need partial-lane
    stores, which Mosaic refuses)."""
    for cand in range(_MAX_BLOCK_ROWS, 7, -8):
        if rows % cand == 0:
            return cand
    return 0


def supported(shape, dtype) -> int:
    """Flat row count if this shape/dtype takes the fused path, else 0."""
    if dtype not in (jnp.float32, jnp.bfloat16):
        return 0
    size = 1
    for d in shape:
        size *= d
    if size == 0 or size % LANES:
        return 0
    rows = size // LANES
    return rows if _block_rows(rows) else 0


def _kernel(threshold: int, inv_keep: float, seed_ref, x_ref, o_ref):
    # independent stream per block: Mosaic accepts at most TWO seed
    # words ("Setting seed with more than 2 values is not supported"),
    # so the block index is mixed into the second word with a large odd
    # multiplier (golden-ratio hash) instead of passed as a third seed
    block = pl.program_id(0) * jnp.int32(-1640531527)  # 0x9E3779B9
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ block)
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    x = x_ref[...]
    o_ref[...] = jnp.where(
        bits >= jnp.uint32(threshold),
        x * jnp.asarray(inv_keep, x.dtype),
        jnp.zeros_like(x),
    )


def _run(rate: float, x: jnp.ndarray, seed: jnp.ndarray, interpret: bool):
    rows = x.size // LANES
    br = _block_rows(rows)
    flat = x.reshape(rows, LANES)
    threshold = min(int(rate * (1 << 32)), (1 << 32) - 1)
    inv_keep = 1.0 / (1.0 - rate)
    out = pl.pallas_call(
        functools.partial(_kernel, threshold, inv_keep),
        grid=(rows // br,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
        interpret=interpret,
    )(seed, flat)
    return out.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def pallas_dropout(rate: float, x: jnp.ndarray, seed: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused dropout over x. `seed`: int32[2] stream identifier (derive
    from the site's PRNG key); `rate`: static drop probability in [0, 1).
    Gradient regenerates the identical mask from `seed` — no residuals
    beyond two words."""
    return _run(rate, x, seed, interpret)


def _fwd(rate, x, seed, interpret):
    return _run(rate, x, seed, interpret), seed


def _bwd(rate, interpret, seed, g):
    # same seed + same static partition -> bit-identical mask on the
    # cotangent; dropout bwd IS dropout fwd applied to g
    return _run(rate, g, seed, interpret), None


pallas_dropout.defvjp(_fwd, _bwd)


def seed_from_key(rng) -> jnp.ndarray:
    """Two int32 stream words from a JAX PRNG key (any impl): fold the
    key data down to [2] so rbg's 4-word and threefry's 2-word keys both
    map to a full-entropy seed pair."""
    kd = jax.random.key_data(rng).ravel().astype(jnp.uint32)
    if kd.size < 2:
        kd = jnp.concatenate([kd, kd])
    folded = kd[:2]
    for i in range(2, int(kd.size)):
        folded = folded.at[i % 2].set(folded[i % 2] ^ kd[i])
    return jax.lax.bitcast_convert_type(folded, jnp.int32)
