"""Device mesh & sharding foundation.

The reference is single-GPU only (SURVEY.md §2.3; `src/trainers.py:18-19`
pins one device). This module is the new distributed substrate: a 2-D
``('data', 'model')`` mesh where

- the ``data`` axis carries batch-parallel replicas of the dense towers,
- the ``model`` axis shards the item-embedding table rows and the
  full-catalog logits columns (vocab sharding) for large catalogs.

Everything downstream expresses placement via `NamedSharding` /
`with_sharding_constraint` and lets XLA's SPMD partitioner insert the
collectives (psum / all_gather / all_to_all) over ICI.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """How to carve the available devices into (data, model) axes."""

    data: int = -1  # -1: take all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else max(1, n_devices // model)
        if data * model > n_devices:
            raise ValueError(
                f"mesh {data}x{model} needs {data * model} devices, "
                f"have {n_devices}"
            )
        return data, model


def parse_mesh_spec(spec: str) -> MeshConfig | None:
    """"" -> None; "auto" -> all devices data-parallel; "data:N,model:M"."""
    if not spec:
        return None
    if spec == "auto":
        return MeshConfig()
    kw = {}
    for part in spec.split(","):
        axis, _, n = part.partition(":")
        kw[axis.strip()] = int(n)
    return MeshConfig(**kw)


def make_mesh(config: MeshConfig | None = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    config = config or MeshConfig()
    data, model = config.resolve(len(devices))
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


# The mesh a Trainer run is executing on. Model code (ops/losses.py)
# can't thread the Mesh object through Flax module configs, but the
# shard_map-composed streaming kernels need it at trace time; the
# trainer registers it here before building its jitted functions.
_ACTIVE_MESH: Mesh | None = None


def set_active_mesh(mesh: Mesh | None) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Mesh:
    if _ACTIVE_MESH is None:
        raise RuntimeError(
            "no active mesh registered (set_active_mesh); "
            "'sharded_streaming' impls require a Trainer mesh run"
        )
    return _ACTIVE_MESH


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def vocab_sharding(mesh: Mesh) -> NamedSharding:
    """Row-sharded [vocab, hidden] table over the model axis."""
    return NamedSharding(mesh, P(MODEL_AXIS))


def logits_sharding(mesh: Mesh) -> NamedSharding:
    """[batch, vocab] logits: batch over data, vocab over model."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def shard_batch(tree, mesh: Mesh):
    """Place a host pytree of [B, ...] arrays onto the mesh, batch-split."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)
