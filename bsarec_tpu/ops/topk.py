"""On-device full-catalog ranking eval.

The reference copies the full [B, V] score matrix to host, masks seen
items with a scipy CSR lookup and runs numpy argpartition
(`src/trainers.py:126-149`) — the dominant eval cost. Here everything
stays on device: seen-item masking is a scatter from per-user padded
history lists, top-k is `jax.lax.top_k`, and HR/NDCG reduce to sums
that accumulate inside the eval scan. Under a vocab-sharded mesh the
same code path partitions into per-shard top-k + cross-shard merge via
XLA's SPMD partitioner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EVAL_KS = (5, 10, 15, 20)
TOP_K = 20


def masked_topk(scores: jnp.ndarray, seen_items: jnp.ndarray, k: int = TOP_K):
    """Zero out seen items then take top-k.

    scores: [B, V]; seen_items: [B, S] int ids, 0-padded (item 0 is the
    padding id, so pad entries harmlessly re-zero column 0). Matches the
    reference's `rating_pred[seen] = 0` semantics (`src/trainers.py:134`)
    — seen items are set to 0.0, not -inf.
    """
    batch = jnp.arange(scores.shape[0])[:, None]
    scores = scores.at[batch, seen_items].set(0.0)
    return jax.lax.top_k(scores, k)


def topk_metrics(topk_idx: jnp.ndarray, answers: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Per-batch metric sums for HR@k / NDCG@k, k in EVAL_KS.

    topk_idx: [B, 20] ranked item ids; answers: [B]; valid: [B] float
    0/1 (masks padded eval rows). Returns [2 * len(EVAL_KS) + 1] sums:
    [hr@5, ndcg@5, hr@10, ndcg@10, hr@15, ndcg@15, hr@20, ndcg@20, count].

    HR@k = 1 if the answer appears in the first k slots; NDCG@k =
    1/log2(rank+2) at its slot (single ground truth ⇒ IDCG=1), matching
    `src/metrics.py:3-31`.
    """
    hit = (topk_idx == answers[:, None]).astype(jnp.float32)  # [B, 20]
    ranks = jnp.arange(topk_idx.shape[1], dtype=jnp.float32)
    gain = hit / jnp.log2(ranks + 2.0)
    sums = []
    for k in EVAL_KS:
        sums.append(jnp.sum(jnp.sum(hit[:, :k], axis=1) * valid))
        sums.append(jnp.sum(jnp.sum(gain[:, :k], axis=1) * valid))
    sums.append(jnp.sum(valid))
    return jnp.stack(sums)


def metrics_from_sums(sums) -> dict:
    """Finalize accumulated `topk_metrics` sums into the metric dict."""
    count = float(sums[-1])
    out = {}
    for i, k in enumerate(EVAL_KS):
        out[f"HR@{k}"] = float(sums[2 * i]) / count
        out[f"NDCG@{k}"] = float(sums[2 * i + 1]) / count
    return out
