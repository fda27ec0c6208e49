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

import functools
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


# --------------------------------------------------------------------------
# streaming (Pallas) kernels composed with the vocab-sharded mesh
# --------------------------------------------------------------------------
#
# `pallas_call` has no SPMD partitioning rule, so the O(B)-memory
# streaming kernels can't be left to the auto-partitioner the way the
# dense paths above are. Instead each model-axis shard runs the kernel
# over ITS OWN table rows inside `shard_map` and the shard-local stats
# are glued with collectives:
#
#   CE:    logZ = logsumexp_shards(logZ_local),
#          gold = Σ_shards gold_local       (0 off-shard)
#   top-k: shift local ids to global, all_gather, re-top-k (identical
#          merge to `sharded_masked_topk`).
#
# This removes the dense fallback for BASELINE config #5 (10M items,
# multi-chip): per-device memory stays O(B + V/m·H) with no [B, V/m]
# logit slab. Scaled reference behavior: `src/model/bsarec.py:33-35`,
# `src/trainers.py:126-149`.


def _local_answers(a, shard, rows):
    """Global gold ids -> shard-local ids; off-shard ids become -1 so
    they never match a column (a raw out-of-range id could land in the
    kernel's -inf padded region and poison the gold sum)."""
    la = a - shard * rows
    return jnp.where((la >= 0) & (la < rows), la, -1)


def _sce_primal(states, table, answers, mesh, model_axis, data_axis,
                block_b, block_v, interpret, dtype):
    loss, _ = _sce_fwd(
        states, table, answers, mesh, model_axis, data_axis,
        block_b, block_v, interpret, dtype,
    )
    return loss


_sce = jax.custom_vjp(_sce_primal, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))


def _sce_fwd(states, table, answers, mesh, model_axis, data_axis,
             block_b, block_v, interpret, dtype):
    from bsarec_tpu.ops.pallas_ce import streaming_ce_stats

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(model_axis, None), P(data_axis)),
        out_specs=(P(data_axis), P(data_axis)),
        # pallas_call's out_shape carries no vma annotation, so the
        # varying-mesh-axes checker can't see through it; the psums
        # below make both outputs model-axis invariant (pinned by
        # tests/test_parallel.py::test_sharded_streaming_ce_matches_dense)
        check_vma=False,
    )
    def fwd(s, t, a):
        rows = t.shape[0]
        shard = jax.lax.axis_index(model_axis)
        loss_l, logz_l = streaming_ce_stats(
            s, t, _local_answers(a, shard, rows),
            block_b=block_b, block_v=block_v, interpret=interpret,
            dtype=dtype,
        )
        gold_l = logz_l - loss_l  # exactly the in-kernel gold sum; 0 off-shard
        m = jax.lax.pmax(logz_l, model_axis)
        logz = jnp.log(jax.lax.psum(jnp.exp(logz_l - m), model_axis)) + m
        gold = jax.lax.psum(gold_l, model_axis)
        return logz - gold, logz

    loss, logz = fwd(states, table, answers)
    return loss, (states, table, answers, logz)


def _sce_bwd(mesh, model_axis, data_axis, block_b, block_v, interpret,
             dtype, res, dloss):
    from bsarec_tpu.ops.pallas_ce import streaming_ce_grads

    states, table, answers, logz = res

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(data_axis, None), P(model_axis, None), P(data_axis),
            P(data_axis), P(data_axis),
        ),
        out_specs=(P(data_axis, None), P(model_axis, None)),
        check_vma=False,  # same pallas out_shape limitation as _sce_fwd
    )
    def bwd(s, t, a, z, d):
        rows = t.shape[0]
        shard = jax.lax.axis_index(model_axis)
        ds_part, dt_part = streaming_ce_grads(
            s, t, _local_answers(a, shard, rows), z, d,
            block_b=block_b, block_v=block_v, interpret=interpret,
            dtype=dtype,
        )
        # each shard's dstates sums only its own softmax columns; each
        # shard's dtable covers its own rows but only this data-shard's
        # batch rows
        return (
            jax.lax.psum(ds_part, model_axis),
            jax.lax.psum(dt_part, data_axis),
        )

    ds, dt = bwd(states, table, answers, logz, dloss)
    return ds, dt, None


_sce.defvjp(_sce_fwd, _sce_bwd)


def sharded_streaming_ce(
    states: jnp.ndarray,  # [B, H], data-sharded
    table: jnp.ndarray,  # [V, H], model-row-sharded (V % m == 0)
    answers: jnp.ndarray,  # [B] global gold ids, data-sharded
    mesh: Mesh,
    model_axis: str = "model",
    data_axis: str = "data",
    block_b: int = 256,
    block_v: int = 4096,
    interpret: bool | None = None,
    dtype: str | None = None,  # per-shard tile compute dtype (see pallas_ce)
) -> jnp.ndarray:
    """Per-example full-catalog CE via per-shard streaming Pallas sweeps.

    Matches `streaming_softmax_ce` (and the dense logsumexp) at f32 up
    to psum reduction order. Differentiable in (states, table).
    """
    assert table.shape[0] % mesh.shape[model_axis] == 0, (
        table.shape, dict(mesh.shape)
    )
    return _sce(states, table, answers, mesh, model_axis, data_axis,
                block_b, block_v, interpret, dtype)


def sharded_streaming_topk(
    states: jnp.ndarray,  # [B, H], data-sharded
    table: jnp.ndarray,  # [V, H], model-row-sharded (V % m == 0)
    seen_masks: jnp.ndarray,  # [m, B, W] per-shard bitmask stack
    mesh: Mesh,
    k: int = 20,
    max_valid_items: int | None = None,
    model_axis: str = "model",
    data_axis: str = "data",
    block_b: int = 128,
    interpret: bool | None = None,
):
    """Streaming masked top-k over a vocab-sharded table.

    `seen_masks` comes from `ops.pallas_rank.build_seen_bitmask_sharded`
    (shard s's slice masks its own rows in shard-local coordinates).
    Returns (values [B, k], global ids [B, k]); ties pick the smallest
    global id, exactly like the unsharded kernel (the final top_k is
    stable and shards are concatenated in id order).
    """
    from bsarec_tpu.ops.pallas_rank import streaming_masked_topk

    m_shards = mesh.shape[model_axis]
    assert table.shape[0] % m_shards == 0, (table.shape, dict(mesh.shape))
    rows = table.shape[0] // m_shards

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(data_axis, None), P(model_axis, None),
            P(model_axis, data_axis, None),
        ),
        out_specs=(P(data_axis, None), P(data_axis, None)),
        # identical all_gather + top_k on every model shard -> outputs
        # are replicated over the model axis by construction (same
        # justification as sharded_masked_topk; pinned by
        # tests/test_parallel.py::test_sharded_streaming_outputs_replicated)
        check_vma=False,
    )
    def topk(s, t, masks):
        shard = jax.lax.axis_index(model_axis)
        start = shard * rows
        nv = (
            rows if max_valid_items is None
            else jnp.clip(max_valid_items - start, 0, rows)
        )
        vals, ids = streaming_masked_topk(
            s, t, masks[0], k=k, n_valid=nv, block_b=block_b,
            interpret=interpret,
        )
        gidx = ids + start
        vals_all = jax.lax.all_gather(vals, model_axis)  # [m, b, k]
        gidx_all = jax.lax.all_gather(gidx, model_axis)
        m = vals_all.shape[0]
        b = vals_all.shape[1]
        vals_cat = vals_all.transpose(1, 0, 2).reshape(b, m * k)
        gidx_cat = gidx_all.transpose(1, 0, 2).reshape(b, m * k)
        fvals, fpos = jax.lax.top_k(vals_cat, k)
        fidx = jnp.take_along_axis(gidx_cat, fpos, axis=-1)
        return fvals, fidx

    return topk(states, table, seen_masks)
