"""Training losses, matching the reference's math at fp32.

Each function documents the reference behavior it reproduces; all are
pure jnp so they jit/grad/shard cleanly. The full-vocab CE is written
so XLA's SPMD partitioner can column-shard the logits matmul + take a
psum-based logsumexp when the embedding table is vocab-sharded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Above this catalog size the dense [B, V] logit materialization is
# replaced by the streaming Pallas kernel (TPU only): memory O(B) and
# one table read per pass instead of B·V·4 bytes of logit traffic.
STREAMING_CE_MIN_VOCAB = 262_144


def full_softmax_ce(
    seq_state: jnp.ndarray,
    item_table: jnp.ndarray,
    answers: jnp.ndarray,
    impl: str = "auto",
    dtype: str = "float32",
) -> jnp.ndarray:
    """Full-catalog cross entropy (reference: `src/model/bsarec.py:30-37`).

    seq_state: [B, H] last-position states; item_table: [V, H];
    answers: [B] int ids. Mean CE over the batch. `impl`: "dense",
    "streaming" (Pallas, see `ops/pallas_ce.py`), or "auto" (streaming
    on TPU for production-scale catalogs, dense otherwise). `dtype` is
    the matmul compute dtype; logsumexp/CE always accumulate fp32.
    """
    # the streaming kernels take dtype=None for "as given"; map the
    # explicit f32 default onto that so an f32 table stays on the f32 path
    k_dtype = None if jnp.dtype(dtype) == jnp.float32 else dtype
    if impl == "sharded_streaming":
        # vocab-sharded mesh run: per-shard Pallas sweeps + collectives
        # (the trainer picks this impl; see parallel/logits.py)
        from bsarec_tpu.core.mesh import active_mesh
        from bsarec_tpu.parallel.logits import sharded_streaming_ce

        return jnp.mean(
            sharded_streaming_ce(
                seq_state, item_table, answers, active_mesh(), dtype=k_dtype
            )
        )
    if impl == "auto":
        use_streaming = (
            item_table.shape[0] >= STREAMING_CE_MIN_VOCAB
            and jax.default_backend() == "tpu"
        )
    else:
        use_streaming = impl == "streaming"
    if use_streaming:
        from bsarec_tpu.ops.pallas_ce import streaming_softmax_ce

        return jnp.mean(
            streaming_softmax_ce(seq_state, item_table, answers, dtype=k_dtype)
        )
    dt = jnp.dtype(dtype)
    logits = jnp.einsum(
        "bh,vh->bv",
        seq_state.astype(dt),
        item_table.astype(dt),
        preferred_element_type=jnp.float32,
    )
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, answers[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - gold)


def pair_bce_masked(pos_logits, neg_logits, pos_ids) -> jnp.ndarray:
    """BCE-with-logits on (pos, neg) pairs, restricted to pos_ids != 0.

    Reference: `src/model/sasrec.py:42-63` (also Caser). The torch code
    computes mean BCE over valid indices for pos and neg separately and
    sums them.
    """
    valid = (pos_ids != 0).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    # BCEWithLogits(x, 1) = softplus(-x);  BCEWithLogits(x, 0) = softplus(x)
    pos_loss = jnp.sum(jax.nn.softplus(-pos_logits) * valid) / denom
    neg_loss = jnp.sum(jax.nn.softplus(neg_logits) * valid) / denom
    return pos_loss + neg_loss


def pair_logsigmoid_bce(pos_logits, neg_logits, eps: float = 1e-24) -> jnp.ndarray:
    """FMLP-Rec's unmasked sigmoid BCE (`src/model/fmlprec.py:54-59`)."""
    pos = -jnp.log(jax.nn.sigmoid(pos_logits) + eps)
    neg = -jnp.log(1.0 - jax.nn.sigmoid(neg_logits) + eps)
    return jnp.mean(pos + neg)


def bpr_loss(pos_logits, neg_logits, gamma: float = 1e-10) -> jnp.ndarray:
    """GRU4Rec's BPR loss (`src/model/gru4rec.py:49-67`)."""
    return -jnp.mean(jnp.log(gamma + jax.nn.sigmoid(pos_logits - neg_logits)))


def info_nce_logits(z_i: jnp.ndarray, z_j: jnp.ndarray, temp: float, sim: str = "dot") -> jnp.ndarray:
    """In-batch InfoNCE over two views (`src/model/duorec.py:47-74`).

    z_i, z_j: [B, H] last-position states of the two views. For each of
    the 2B rows, the positive is its pair; negatives are the other
    2(B-1) rows (self excluded). Returns mean CE — algebraically equal
    to the reference's concat-positive-column construction.
    """
    z = jnp.concatenate([z_i, z_j], axis=0)  # [2B, H]
    if sim == "cos":
        z_n = z / jnp.linalg.norm(z, axis=-1, keepdims=True).clip(1e-12)
        sims = jnp.einsum("ah,bh->ab", z_n, z_n, preferred_element_type=jnp.float32)
    else:
        sims = jnp.einsum("ah,bh->ab", z, z, preferred_element_type=jnp.float32)
    sims = sims / temp
    n = z.shape[0]
    b = n // 2
    idx = jnp.arange(n)
    pos_col = jnp.where(idx < b, idx + b, idx - b)
    pos = sims[idx, pos_col]
    sims = jnp.where(jnp.eye(n, dtype=bool), -jnp.inf, sims)  # drop self
    logz = jax.nn.logsumexp(sims, axis=-1)
    return jnp.mean(logz - pos)
