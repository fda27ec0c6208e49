"""Column-sharded full-catalog softmax CE and top-k retrieval.

Replaces the reference's single-device `state @ E.T` + host numpy
argpartition (`src/model/bsarec.py:33-35`, `src/trainers.py:126-149`)
with vocab-sharded device code:

- CE: each model shard computes its [b, V/m] logit slab; the global
  logsumexp assembles from a pmax (stability max) + psum (exp sums),
  and the gold logit arrives via psum from its owning shard. Mean CE
  over the global batch.
- top-k: per-shard seen-item masking (reference semantics: seen → 0.0)
  and local `lax.top_k`, then an all_gather of (values, global ids)
  and a final top-k over m·k candidates — identical results to the
  unsharded path up to score ties.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def sharded_softmax_ce(
    states: jnp.ndarray,  # [B, H], data-sharded
    table: jnp.ndarray,  # [V, H], model-row-sharded
    answers: jnp.ndarray,  # [B], data-sharded
    mesh: Mesh,
    model_axis: str = "model",
    data_axis: str = "data",
) -> jnp.ndarray:
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(model_axis, None), P(data_axis)),
        out_specs=P(data_axis),
    )
    def ce(s, t, a):
        logits = jnp.einsum("bh,vh->bv", s, t, preferred_element_type=jnp.float32)
        # stability max: computed on detached logits (pmax has no JVP
        # rule; the shift cancels exactly in d(logsumexp)/d(logits))
        gmax = jax.lax.pmax(
            jnp.max(jax.lax.stop_gradient(logits), axis=-1), model_axis
        )
        local_sum = jnp.sum(jnp.exp(logits - gmax[:, None]), axis=-1)
        logz = jnp.log(jax.lax.psum(local_sum, model_axis)) + gmax

        shard = jax.lax.axis_index(model_axis)
        rows = t.shape[0]
        local = a - shard * rows
        owned = (local >= 0) & (local < rows)
        gold_local = jnp.take_along_axis(
            logits, jnp.clip(local, 0, rows - 1)[:, None], axis=-1
        )[:, 0]
        gold = jax.lax.psum(jnp.where(owned, gold_local, 0.0), model_axis)
        return logz - gold

    return jnp.mean(ce(states, table, answers))


def sharded_masked_topk(
    states: jnp.ndarray,  # [B, H], data-sharded
    table: jnp.ndarray,  # [V, H], model-row-sharded
    seen_items: jnp.ndarray,  # [B, S] 0-padded, data-sharded
    mesh: Mesh,
    k: int = 20,
    max_valid_items: int | None = None,
    model_axis: str = "model",
    data_axis: str = "data",
):
    """Returns (values [B, k], global item ids [B, k]).

    Seen items are zeroed per shard before the local top-k (reference
    masking semantics). Ids >= max_valid_items (table padding rows,
    BERT4Rec's [mask] row) are forced to -inf so they never surface.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(model_axis, None), P(data_axis, None)),
        out_specs=(P(data_axis, None), P(data_axis, None)),
        # outputs are replicated over the model axis by construction
        # (identical all_gather + top_k on every shard); not statically
        # inferable, so varying-mesh-axes checking is disabled here
        check_vma=False,
    )
    def topk(s, t, seen):
        logits = jnp.einsum("bh,vh->bv", s, t, preferred_element_type=jnp.float32)
        shard = jax.lax.axis_index(model_axis)
        rows = t.shape[0]
        start = shard * rows

        # mask seen items owned by this shard -> 0.0
        local_seen = seen - start
        owned = (local_seen >= 0) & (local_seen < rows)
        safe = jnp.where(owned, local_seen, 0)
        batch_ix = jnp.arange(logits.shape[0])[:, None]
        current = logits[batch_ix, safe]
        logits = logits.at[batch_ix, safe].set(jnp.where(owned, 0.0, current))

        # invalidate padding / trimmed rows
        if max_valid_items is not None:
            global_ids = start + jnp.arange(rows)[None, :]
            logits = jnp.where(global_ids >= max_valid_items, -jnp.inf, logits)

        vals, idx = jax.lax.top_k(logits, k)
        gidx = idx + start
        vals_all = jax.lax.all_gather(vals, model_axis)  # [m, b, k]
        gidx_all = jax.lax.all_gather(gidx, model_axis)
        m = vals_all.shape[0]
        b = vals_all.shape[1]
        vals_cat = vals_all.transpose(1, 0, 2).reshape(b, m * k)
        gidx_cat = gidx_all.transpose(1, 0, 2).reshape(b, m * k)
        fvals, fpos = jax.lax.top_k(vals_cat, k)
        fidx = jnp.take_along_axis(gidx_cat, fpos, axis=-1)
        return fvals, fidx

    return topk(states, table, seen_items)
