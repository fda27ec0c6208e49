"""Multi-host input pipeline, exercised single-process on the 8-device
CPU mesh (process_count=1 owns everything; global_batch still produces
data-axis-sharded global arrays)."""

import jax
import jax.numpy as jnp
import numpy as np

from bsarec_tpu.core.mesh import MeshConfig, make_mesh
from bsarec_tpu.data.multihost import HostShardedDataset, global_batch, host_shard


def test_host_shard_single_process():
    lo, hi = host_shard(103)
    assert (lo, hi) == (0, 103)


def test_global_batch_is_data_sharded():
    mesh = make_mesh(MeshConfig(data=4, model=2))
    local = {
        "input_ids": np.arange(8 * 5, dtype=np.int32).reshape(8, 5),
        "answers": np.arange(8, dtype=np.int32),
    }
    out = global_batch(local, mesh, 8)
    assert out["input_ids"].shape == (8, 5)
    assert "data" in str(out["input_ids"].sharding.spec)
    np.testing.assert_array_equal(np.asarray(out["answers"]), local["answers"])
    # sharded arrays feed jitted compute directly
    s = jax.jit(lambda b: jnp.sum(b["input_ids"]) + jnp.sum(b["answers"]))(out)
    assert int(s) == int(local["input_ids"].sum() + local["answers"].sum())


def test_host_sharded_dataset_schedule_deterministic():
    fields = {
        "x": np.arange(50, dtype=np.int32),
        "y": (np.arange(50, dtype=np.int32) * 7).astype(np.int32),
    }
    ds = HostShardedDataset(fields, batch_size=16, seed=5)
    a = [b["x"].copy() for b in ds.epoch_batches(epoch=3)]
    b = [b["x"].copy() for b in ds.epoch_batches(epoch=3)]
    assert len(a) == 3  # 50 // 16
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
    # rows paired consistently across fields
    for batch in ds.epoch_batches(epoch=0):
        np.testing.assert_array_equal(batch["y"], batch["x"] * 7)
    # different epochs shuffle differently
    c = [bb["x"].copy() for bb in ds.epoch_batches(epoch=4)]
    assert any((xa != xc).any() for xa, xc in zip(a, c))
