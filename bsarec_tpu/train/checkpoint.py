"""Checkpoint save/load.

Parity with the reference's state-dict checkpoints
(`src/utils.py:171-176`, `src/trainers.py:43-60`): parameters only
(the reference never checkpoints optimizer state), saved on each
validation improvement and reloaded for the final test. Uses flax
msgpack serialization; a `filter_fn` hook supports PREPRec-style
transfer loads that drop dataset-specific buffers
(`repo-b/main.py:158-160`).

Beyond the reference, `save_train_state`/`load_train_state` checkpoint
the FULL training state (params + Adam moments + epoch + PRNG key) so
an interrupted run resumes exactly where it stopped (`--resume`): the
crash-recovery story the reference lacks (SURVEY.md §5, failure
detection: "crashes are fatal").
"""

from __future__ import annotations

import os
from pathlib import Path

import flax.serialization
import jax


def _atomic_write(path: str | Path, data: bytes) -> None:
    """Write-then-rename so a crash mid-write never corrupts the previous
    good checkpoint (the whole point of --resume is surviving crashes)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as fh:
        fh.write(data)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


def save_params(params, path: str | Path) -> None:
    _atomic_write(path, flax.serialization.to_bytes(jax.device_get(params)))


def load_params(template_params, path: str | Path, filter_fn=None):
    with open(path, "rb") as fh:
        restored = flax.serialization.from_bytes(jax.device_get(template_params), fh.read())
    if filter_fn is not None:
        restored = filter_fn(template_params, restored)
    return restored


def save_train_state(
    path: str | Path, params, opt_state, epoch: int, rng,
    best_score=None, patience_counter: int = 0, config_fp: str = "",
) -> None:
    """Full resumable state: params, optimizer state, epoch, PRNG key,
    plus the early-stopping state (best validation score vector and
    patience counter) so a resumed run cannot overwrite a better
    pre-crash checkpoint or restart the patience clock.

    `config_fp` is the run's model-config fingerprint (a JSON string):
    resume compares it against the relaunch's config and fails loudly on
    mismatch, because CLI flags omitted at relaunch fall back to their
    DEFAULTS and can silently rebuild a different architecture whose
    param shapes still match the snapshot (e.g. a head-count change)."""
    import numpy as np

    if best_score is None:
        best = np.full((1,), -np.inf, np.float32)  # sentinel: no best yet
    else:
        best = np.asarray(best_score, np.float32).reshape(-1)
    state = {
        "params": jax.device_get(params),
        "opt_state": jax.device_get(opt_state),
        "epoch": epoch,
        "rng": jax.device_get(rng),
        "best_score": best,
        "patience_counter": int(patience_counter),
        "config_fp": np.frombuffer(config_fp.encode(), np.uint8).copy(),
    }
    _atomic_write(path, flax.serialization.to_bytes(state))


def load_train_state(path: str | Path, params, opt_state, rng):
    """Restore a `save_train_state` checkpoint against matching templates.

    Returns (params, opt_state, epoch, rng, best_score, patience_counter,
    config_fp) where best_score is None when the snapshot predates any
    validation and config_fp is None for snapshots from before the
    fingerprint was recorded."""
    import numpy as np

    template = {
        "params": jax.device_get(params),
        "opt_state": jax.device_get(opt_state),
        "epoch": 0,
        "rng": jax.device_get(rng),
        "best_score": np.zeros((1,), np.float32),
        "patience_counter": 0,
        "config_fp": np.zeros((0,), np.uint8),
    }
    with open(path, "rb") as fh:
        blob = fh.read()
    try:
        state = flax.serialization.from_bytes(template, blob)
        fp = bytes(np.asarray(state["config_fp"])).decode() or None
    except (KeyError, ValueError):  # pre-fingerprint snapshot layout
        del template["config_fp"]
        state = flax.serialization.from_bytes(template, blob)
        fp = None
    best = np.asarray(state["best_score"])
    best_score = None if np.all(np.isneginf(best)) else best
    return (
        state["params"], state["opt_state"], int(state["epoch"]),
        state["rng"], best_score, int(state["patience_counter"]), fp,
    )


def transfer_filter(exclude_prefixes: tuple[str, ...]):
    """Keep the template's values for params whose path starts with any
    excluded prefix (PREPRec transfer semantics)."""

    def apply(template, restored):
        flat_t = flax.traverse_util.flatten_dict(template)
        flat_r = flax.traverse_util.flatten_dict(restored)
        for key in flat_r:
            path = "/".join(str(k) for k in key)
            if any(path.startswith(p) for p in exclude_prefixes):
                flat_r[key] = flat_t[key]
        return flax.traverse_util.unflatten_dict(flat_r)

    return apply
