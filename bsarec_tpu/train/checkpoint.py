"""Checkpoint save/load.

Parity with the reference's state-dict checkpoints
(`src/utils.py:171-176`, `src/trainers.py:43-60`): parameters only
(the reference never checkpoints optimizer state), saved on each
validation improvement and reloaded for the final test. Uses flax
msgpack serialization; a `filter_fn` hook supports PREPRec-style
transfer loads that drop dataset-specific buffers
(`repo-b/main.py:158-160`).
"""

from __future__ import annotations

from pathlib import Path

import flax.serialization
import jax


def save_params(params, path: str | Path) -> None:
    host_params = jax.device_get(params)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(flax.serialization.to_bytes(host_params))


def load_params(template_params, path: str | Path, filter_fn=None):
    with open(path, "rb") as fh:
        restored = flax.serialization.from_bytes(jax.device_get(template_params), fh.read())
    if filter_fn is not None:
        restored = filter_fn(template_params, restored)
    return restored


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
