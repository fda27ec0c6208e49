"""Row-sharded item-embedding table with explicit collectives.

The reference holds one `nn.Embedding` on a single GPU
(`src/model/_abstract_model.py:10`). For catalogs that do not fit one
chip (BASELINE.json config #5: 10M items × d=256), the table is
row-sharded over the mesh 'model' axis and lookups become a
masked-local-gather + `psum` over ICI: each shard gathers the rows it
owns (out-of-range ids clamp to 0 and zero-mask), and the psum
assembles full embedding vectors on every data shard. The backward
pass (scatter-add of grads into owned rows) falls out of shard_map's
AD automatically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.5 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def pad_vocab_rows(table: np.ndarray | jnp.ndarray, num_shards: int):
    """Pad [V, H] to a multiple of num_shards rows (zeros — padding rows
    can never be looked up or win top-k since their scores are masked)."""
    v = table.shape[0]
    padded = -(-v // num_shards) * num_shards
    if padded == v:
        return table, v
    pad = jnp.zeros((padded - v,) + table.shape[1:], table.dtype)
    return jnp.concatenate([jnp.asarray(table), pad], axis=0), v


def sharded_embedding_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
    model_axis: str = "model",
    data_axis: str = "data",
) -> jnp.ndarray:
    """Gather rows of a row-sharded [V, H] table for [B, ...] ids.

    ids are sharded over the data axis (batch); the result is
    [B, ..., H] with the same batch sharding, assembled by a psum over
    the model axis.
    """
    ids_spec = P(data_axis, *([None] * (ids.ndim - 1)))
    out_spec = P(data_axis, *([None] * ids.ndim))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(model_axis, None), ids_spec),
        out_specs=out_spec,
    )
    def lookup(local_table, local_ids):
        shard = jax.lax.axis_index(model_axis)
        rows_per_shard = local_table.shape[0]
        local = local_ids - shard * rows_per_shard
        valid = (local >= 0) & (local < rows_per_shard)
        gathered = jnp.take(local_table, jnp.clip(local, 0, rows_per_shard - 1), axis=0)
        gathered = jnp.where(valid[..., None], gathered, 0.0)
        return jax.lax.psum(gathered, model_axis)

    return lookup(table, ids)
