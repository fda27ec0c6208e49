"""Additive attention-mask builders.

Behavioral contract (reference: `src/model/_abstract_model.py:41-69`):
masks are additive, 0 where attention is allowed and -10000 where not;
padding positions (item id 0) are always disallowed as keys; the causal
variant additionally disallows attending to future positions.
Shapes are [B, 1, L, L] (causal) / [B, 1, 1, L] (bidirectional), ready
to broadcast over heads.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -10000.0


def causal_additive_mask(input_ids: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, L] int ids -> [B, 1, L, L] additive mask (0 keep / -1e4 drop)."""
    valid = (input_ids > 0).astype(dtype)  # [B, L] keys
    seq_len = input_ids.shape[-1]
    causal = jnp.tril(jnp.ones((seq_len, seq_len), dtype=dtype))  # [L, L]
    keep = valid[:, None, None, :] * causal[None, None, :, :]
    return (1.0 - keep) * NEG_INF


def bidirectional_additive_mask(input_ids: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, L] int ids -> [B, 1, 1, L] additive padding mask."""
    valid = (input_ids > 0).astype(dtype)
    return (1.0 - valid[:, None, None, :]) * NEG_INF
