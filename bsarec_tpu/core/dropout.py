"""Dropout tuned for the TPU hardware RNG.

Round-2 profiling (BASELINE.md "where the time goes") showed the p=0.5
dropout masks dominate the Beauty step: with threefry they were ~40% of
the step; switching to the rbg hardware generator got 154k -> 246.5k
ex/s, and the residual gap to the 301k no-dropout ceiling is mask
generation + apply. Two further levers land here:

1. **One RNG bit per mask element** (p = 0.5 only, the reference's
   training config): every generated uint32 already holds 32
   independent Bernoulli(1/2) bits, so the mask draws 32x fewer
   hardware-RNG words and unpacks with a shift+AND along the minor
   axis (last dim padded up to a multiple of 32, then sliced).
2. **No uint->float conversion** for other rates: `bits >= t` with
   t = rate·2^32 replaces bernoulli's uniform-float construction —
   one integer compare instead of a convert + float compare.

Under threefry (`--prng threefry`) this module defers to
`jax.random.bernoulli` with flax's exact formulation. (The stream still
shifts relative to `nn.Dropout` because flax folds the rng with the
module name — `FastDropout_0` vs `Dropout_0`; dropout streams carry no
bit-parity contract, only distribution.)
"""

from __future__ import annotations

import contextlib
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# rbg-path mask construction, on-chip paired sweep at the bench config
# (v5e, results/r3_runs/sweep_dropout_onchip.log): "threshold" (integer
# compare on full-size random words — fastest, 267.1k ex/s), "bits"
# (32x fewer RNG words via bit-unpacking at p=0.5 — the unpack's
# shift/AND/pad work cancels the RNG savings on the VPU, 260.8k), "u8"
# (4x fewer RNG words bitcast to uint8 lanes — no shifts, one compare,
# but still slower than threshold, 248.3k: the bitcast relayout +
# sub-word compare cost more than the saved RNG words; drop rate
# quantized to the nearest 1/256, exact at the reference's p=0.5),
# "bernoulli" (stock uniform-float path, 220.9k), "pallas" (fused
# kernel: bits generated INSIDE the apply pass via the in-kernel
# hardware PRNG, so the mask array never touches HBM —
# ops/pallas_dropout.py; TPU-only, falls back to threshold elsewhere),
# "iota" (DIAGNOSTIC
# ONLY: a deterministic
# alternating keep pattern from broadcasted_iota — zero RNG cost but
# the full mask-apply cost, so paired sweeps can split the no-dropout
# gap into generation vs apply; never use for real training).
# Read at trace time (not import) so sweeps can flip it per compile.
def _strategy() -> str:
    return os.environ.get("BSAREC_DROPOUT", "threshold")


def _rbg_active() -> bool:
    try:
        return jax.config.jax_default_prng_impl == "rbg"
    except AttributeError:  # pragma: no cover
        return False


# ---- pooled strategy: ONE RngBitGenerator call per step ----------------
# (VERDICT r4 item 5.) Under BSAREC_DROPOUT=pooled the train-step loss
# wrapper (train/loop.py) first counts every dropout site's word demand
# with a jax.eval_shape pass, then issues a single jax.random.bits call
# for the sum and re-traces with the pool active; each FastDropout site
# consumes a STATIC slice. Same Bernoulli law and HBM traffic as
# "threshold", 1 RngBitGenerator dispatch instead of 8 — this isolates
# and amortizes per-call RNG overhead (measured in
# benchmarks/rbg_pool_probe.py).

_POOL_STATE: list = []  # active _BitPool stack (trace-time only)


class _BitPool:
    """words=None counts demand; otherwise serves static slices."""

    __slots__ = ("words", "offset")

    def __init__(self, words):
        self.words, self.offset = words, 0

    def take(self, shape):
        n = int(np.prod(shape)) if shape else 1
        if self.words is not None and self.offset + n > self.words.shape[0]:
            raise ValueError(
                f"dropout bit pool exhausted at offset {self.offset}+{n} "
                f"> {self.words.shape[0]} (counting/real trace mismatch)"
            )
        out = (
            None if self.words is None
            else jax.lax.slice_in_dim(self.words, self.offset, self.offset + n)
        )
        self.offset += n
        return out


@contextlib.contextmanager
def dropout_bit_pool(words):
    """Trace-time scope: pooled-strategy FastDropout sites consume
    slices of `words` ([N] uint32). words=None = demand-counting pass
    (pair with jax.eval_shape; read `.offset` after)."""
    pool = _BitPool(words)
    _POOL_STATE.append(pool)
    try:
        yield pool
    finally:
        _POOL_STATE.pop()


def pool_enabled() -> bool:
    """True when the train step should run the count+pool wrapper."""
    return _strategy() == "pooled" and _rbg_active()


def _keep_mask_bits(rng, shape) -> jnp.ndarray:
    """Bernoulli(1/2) keep mask from unpacked hardware-RNG bits."""
    last = shape[-1] if shape else 1
    nwords = (last + 31) // 32
    words = jax.random.bits(rng, tuple(shape[:-1]) + (nwords,), jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[..., None] >> shifts) & jnp.uint32(1)
    bits = bits.reshape(tuple(shape[:-1]) + (nwords * 32,))[..., :last]
    return bits.astype(jnp.bool_).reshape(shape)  # () stays ()


def _keep_mask_u8(rng, rate: float, shape) -> jnp.ndarray:
    """Keep mask from uint8 lanes bitcast out of 4x fewer rbg words.

    Unlike the 1-bit unpack, the bitcast is a pure relayout (no
    shift/AND), so the 4x RNG-word saving isn't spent on VPU unpack
    work. The drop probability is quantized to round(rate*256)/256 —
    exact for the reference's p=0.5 (t=128), off by <1/512 otherwise.
    """
    last = shape[-1] if shape else 1
    nwords = (last + 3) // 4
    words = jax.random.bits(rng, tuple(shape[:-1]) + (nwords,), jnp.uint32)
    lanes = jax.lax.bitcast_convert_type(words, jnp.uint8)  # [..., nwords, 4]
    lanes = lanes.reshape(tuple(shape[:-1]) + (nwords * 4,))[..., :last]
    return (lanes >= jnp.uint8(min(round(rate * 256), 255))).reshape(shape)


def fast_dropout(rng, rate: float, x: jnp.ndarray) -> jnp.ndarray:
    """Dropout with hardware-RNG-friendly mask construction (see
    module docstring). Semantics: iid Bernoulli(1-rate) keep mask,
    kept values scaled by 1/(1-rate) — the same distribution as
    `flax.linen.Dropout`, on a different random stream."""
    if rate >= 1.0:  # nn.Dropout's special case: everything drops
        return jnp.zeros_like(x)
    keep_prob = 1.0 - rate
    strategy = _strategy()
    if strategy == "bernoulli":
        keep = jax.random.bernoulli(rng, p=keep_prob, shape=x.shape)
    elif strategy == "bits" and rate == 0.5:
        keep = _keep_mask_bits(rng, x.shape)
    elif strategy == "u8":
        keep = _keep_mask_u8(rng, rate, x.shape)
    elif strategy == "pooled" and _POOL_STATE:
        words = _POOL_STATE[-1].take(x.shape)
        if words is None:  # counting pass under jax.eval_shape
            keep = jnp.zeros(x.shape, jnp.bool_)
        else:
            t = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
            keep = (words >= t).reshape(x.shape)
    elif strategy == "u8direct":
        # ask the generator for uint8 words directly: if XLA's
        # RngBitGenerator emits u8 natively this is 4x less mask-gen
        # HBM traffic with zero unpack/relayout work (quantized to the
        # nearest 1/256 like "u8"; exact at the reference's p=0.5)
        t8 = jnp.uint8(min(round(rate * 256), 255))
        keep = jax.random.bits(rng, x.shape, jnp.uint8) >= t8
    elif strategy == "iota":  # diagnostic: RNG-free mask, real apply
        dim = max(len(x.shape) - 1, 0)
        idx = jax.lax.broadcasted_iota(jnp.uint32, x.shape or (1,), dim)
        keep = ((idx & 1) == 0).reshape(x.shape)
    elif strategy == "pallas":
        # fused kernel: bits generated INSIDE the apply pass, so the
        # mask array never touches HBM (ops/pallas_dropout.py); falls
        # back to the threshold path off-TPU or on unsupported shapes
        from bsarec_tpu.ops.pallas_dropout import (
            pallas_dropout,
            seed_from_key,
            supported,
        )

        if jax.default_backend() == "tpu" and supported(x.shape, x.dtype):
            return pallas_dropout(rate, x, seed_from_key(rng))
        t = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
        keep = jax.random.bits(rng, x.shape, jnp.uint32) >= t
    else:
        t = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
        keep = jax.random.bits(rng, x.shape, jnp.uint32) >= t
    return jax.lax.select(keep, x / jnp.asarray(keep_prob, x.dtype),
                          jnp.zeros_like(x))


class FastDropout(nn.Module):
    """Drop-in `nn.Dropout` replacement: hardware-RNG fast path when
    the session PRNG is rbg, `nn.Dropout`'s bernoulli construction
    otherwise. `deterministic` may come from the constructor or the
    call, like `nn.Dropout`."""

    rate: float
    deterministic: bool | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool | None = None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        if _rbg_active():
            return fast_dropout(rng, self.rate, x)
        keep_prob = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, p=keep_prob, shape=x.shape)
        return jax.lax.select(mask, x / keep_prob, jnp.zeros_like(x))
