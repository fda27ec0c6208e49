"""Multi-host input pipeline.

The reference feeds a single GPU from DataLoader worker processes
(`src/dataset.py:211`) / a multiprocess WarpSampler (`repo-b/utils.py:
252-311`). On a multi-host TPU slice the equivalent problem is: each
host holds (or reads) only its slice of the data, and per-step batches
must assemble into one *global* jax.Array sharded over the mesh's data
axis without any host ever materializing the full batch.

Design (standard JAX multi-host recipe):
- `init_distributed()` wires `jax.distributed` from the TPU runtime env
  (no-op in single-process runs);
- `host_shard(n)` gives this process's contiguous [lo, hi) row range
  (for workloads that partition rows up front);
- `global_batch(local, mesh)` lifts each host's local batch rows into a
  global device array sharded over the `data` axis via
  `jax.make_array_from_process_local_data`;
- `HostShardedDataset` yields per-epoch batch schedules that are
  *identical on every host* (all hosts seed the same PRNG) over global
  row ids, with each host reading only its slice of every batch (use a
  np.memmap so unread rows never load).

Single-process behavior is the identity (host owns everything), which
is what the tests pin; the multi-process path uses only documented JAX
APIs that the dryrun validates structurally.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bsarec_tpu.core.mesh import DATA_AXIS


def init_distributed(**kwargs) -> None:
    """Initialize jax.distributed across hosts.

    Must run before any other jax call (touching the backend first would
    boot a local single-process runtime). No-op when already initialized
    or when no coordinator is configured (single-process runs); any other
    failure propagates — silently continuing would let every host train
    as an independent job with duplicated work."""
    try:
        if jax.distributed.is_initialized():
            return
    except AttributeError:  # older jax: fall through to initialize()
        pass
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        msg = str(e).lower()
        # benign: already initialized (by the launcher) or no coordinator
        # env present (single-process local run)
        if "already" not in msg and "coordinator" not in msg:
            raise


def host_shard(n_rows: int) -> tuple[int, int]:
    """This process's contiguous [lo, hi) slice of a global row range."""
    p, np_ = jax.process_index(), jax.process_count()
    per = -(-n_rows // np_)
    return p * per, min((p + 1) * per, n_rows)


def global_batch(local: dict[str, np.ndarray], mesh: Mesh, global_rows: int):
    """Assemble per-host local batch rows into one global jax.Array per
    field, sharded over the data axis."""
    out = {}
    for k, v in local.items():
        sharding = NamedSharding(mesh, P(DATA_AXIS, *([None] * (v.ndim - 1))))
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, (global_rows, *v.shape[1:])
        )
    return out


@dataclasses.dataclass
class HostShardedDataset:
    """Deterministic globally-consistent batch schedule over global
    arrays (use a np.memmap to avoid loading rows other hosts own).

    Every host constructs the same permutation (same seed), reads only
    its slice of each global batch, and contributes it via
    `global_batch`. The resulting global batch order is identical to the
    single-host run.
    """

    # fields hold the GLOBAL arrays, indexable by global row id (a
    # np.memmap works — each host only ever *reads* the rows it owns,
    # so nothing forces the whole array into memory)
    fields: dict[str, np.ndarray]
    batch_size: int  # global batch size
    seed: int

    def __post_init__(self):
        self.n_rows = next(iter(self.fields.values())).shape[0]
        n_proc = max(jax.process_count(), 1)
        if self.batch_size % n_proc:
            raise ValueError(
                f"process count ({n_proc}) must divide the global batch "
                f"size ({self.batch_size})"
            )
        self.local_batch = self.batch_size // n_proc

    def epoch_batches(self, epoch: int):
        """Yield per-host local batch dicts for one epoch; feed each to
        `global_batch`. Incomplete trailing batches are dropped (the
        on-device scan path pads instead; multi-host favors static
        shapes per step)."""
        rng = np.random.default_rng((self.seed, epoch))
        perm = rng.permutation(self.n_rows)
        steps = self.n_rows // self.batch_size
        yield from self.epoch_batches_from_perm(
            perm[: steps * self.batch_size]
        )

    def epoch_batches_from_perm(self, perm: np.ndarray):
        """Local slices of an externally supplied global batch schedule.

        `perm` must be a multiple of the global batch size — pad it by
        wrapping (`perm + perm[:padded - n]`) to reproduce the on-device
        scan's padded schedule exactly, making the multi-host run's
        global batch sequence bit-equal to the single-host run
        (the Trainer's `--multihost` path does this)."""
        if len(perm) % self.batch_size:
            raise ValueError(
                f"schedule length {len(perm)} not a multiple of the "
                f"global batch size {self.batch_size}"
            )
        p = jax.process_index()
        for s in range(len(perm) // self.batch_size):
            rows = perm[s * self.batch_size : (s + 1) * self.batch_size]
            mine = rows[p * self.local_batch : (p + 1) * self.local_batch]
            yield {k: v[mine] for k, v in self.fields.items()}
