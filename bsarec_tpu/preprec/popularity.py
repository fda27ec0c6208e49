"""Time-indexed popularity encodings — PREPRec's item representation.

Reference behavior (`repo-b/model_utils.py:297-481`): items carry NO
learned id embedding; instead each (item, time-bucket) pair maps to a
fixed feature vector of popularity percentiles — a sliding window of
`input_units/base_dim` coarse ("month") buckets × `base_dim` soft-one-
hot percentile dims, plus a fine ("week") window. This is what makes
zero-shot cross-domain transfer possible: weights never see item ids.

TPU-first storage: instead of the reference's flat
[(T·base_dim) rows × items] table with zero-row/col padding and flat
fancy indexing, the table lives in HBM as [T + nwin - 1, base_dim,
items + 1] (front-padded with nwin-1 zero periods, item 0 = padding
column) and a lookup is two vectorized gathers that XLA fuses — no
host round trips, grad-free (tables are constants, as in the
reference's `register_buffer` + `.detach()`).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PopularityTable:
    """One popularity table (coarse or fine)."""

    table: jnp.ndarray  # [T + nwin - 1, base_dim, items + 1]
    base_dim: int
    nwin: int  # windows considered = input_units // base_dim

    @property
    def input_units(self) -> int:
        return self.base_dim * self.nwin

    @classmethod
    def from_flat(cls, flat: np.ndarray, base_dim: int, input_units: int) -> "PopularityTable":
        """flat: [(T*base_dim), items] as written by preprocessing
        (`data/data.py` wtembed/week_embed2 artifacts)."""
        if base_dim == 0 or input_units == 0:
            return cls(jnp.zeros((1, 1, flat.shape[-1] + 1), jnp.float32), 1, 1)
        t = flat.shape[0] // base_dim
        nwin = input_units // base_dim
        cube = flat.reshape(t, base_dim, flat.shape[1]).astype(np.float32)
        cube = np.concatenate([np.zeros((t, base_dim, 1), np.float32), cube], axis=2)
        front = np.zeros((nwin - 1, base_dim, cube.shape[2]), np.float32)
        return cls(jnp.asarray(np.concatenate([front, cube], axis=0)), base_dim, nwin)

    def gather(self, items: jnp.ndarray, times: jnp.ndarray) -> jnp.ndarray:
        """items, times: [...] int -> [..., input_units] features.

        Equivalent to the reference's flat row indexing
        `time*base_dim + arange(input_units)` over the zero-padded
        table (`model_utils.py:351-385`): a window of the nwin periods
        ending at `times`, ordered oldest-first, base_dim inner.
        """
        t_max = self.table.shape[0] - 1
        window = times[..., None] + jnp.arange(self.nwin)  # [..., nwin]
        window = jnp.clip(window, 0, t_max)
        # one joint gather over (period, item): [..., nwin, base_dim].
        # Indexing period-then-item (table[window] followed by a
        # take_along_axis) materializes [..., nwin, base_dim, items+1]
        # first — at catalog scale that intermediate is O(V) per
        # candidate (12.3 GB at a 1M-item eval sweep; compile-time
        # bounds-check failure, results/r5_runs/preprec_scale_1m_fixed.log
        # first attempt) even though the final result is tiny.
        item_ix = jnp.broadcast_to(items[..., None], window.shape)
        feats = self.table[window, :, item_ix]  # [..., nwin, base_dim]
        return feats.reshape(feats.shape[:-2] + (self.nwin * self.base_dim,))


@dataclasses.dataclass
class PopularityEncoding:
    """Concatenated coarse+fine popularity features (month ++ week)."""

    month: PopularityTable
    week: PopularityTable

    @classmethod
    def load(cls, month_file: str, week_file: str, cfg) -> "PopularityEncoding":
        month = PopularityTable.from_flat(
            np.loadtxt(month_file, ndmin=2), cfg.base_dim1, cfg.input_units1
        )
        week = PopularityTable.from_flat(
            np.loadtxt(week_file, ndmin=2), cfg.base_dim2, cfg.input_units2
        )
        return cls(month, week)

    def __call__(self, items, time1, time2) -> jnp.ndarray:
        return jnp.concatenate(
            [self.month.gather(items, time1), self.week.gather(items, time2)], axis=-1
        )


@dataclasses.dataclass
class EvalPopularity:
    """Recent-week-adjusted popularity for eval candidates
    (`model_utils.py:388-481`): the week component is replaced by a
    per-(user, candidate-slot) table built offline from the most recent
    fine-period counts."""

    month: PopularityTable
    week_eval: jnp.ndarray  # [users, n_candidates, base_dim2]
    base_dim2: int

    @classmethod
    def load(cls, month_file: str, week_eval_file: str, cfg) -> "EvalPopularity":
        month = PopularityTable.from_flat(
            np.loadtxt(month_file, ndmin=2), cfg.base_dim1, cfg.input_units1
        )
        flat = np.loadtxt(week_eval_file, ndmin=2).astype(np.float32)
        users = flat.shape[0] // cfg.base_dim2
        cube = flat.reshape(users, cfg.base_dim2, flat.shape[1]).swapaxes(1, 2)
        return cls(month, jnp.asarray(cube), cfg.base_dim2)

    def __call__(self, items, time1, users) -> jnp.ndarray:
        """items/time1: [B, C]; users: [B] 1-based -> [B, C, feats]."""
        month = self.month.gather(items, time1)
        recent = self.week_eval[users - 1]  # [B, C, base_dim2]
        return jnp.concatenate([month, recent[:, : items.shape[1], :]], axis=-1)


def sinusoid_table(n_position: int, dim: int) -> np.ndarray:
    """Classic fixed sinusoidal table (`model_utils.py:200-224`)."""
    pos = np.arange(n_position)[:, None]
    j = np.arange(dim)[None, :]
    angle = pos / np.power(10000.0, 2 * (j // 2) / dim)
    table = np.zeros((n_position, dim))
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)
