"""AOT serving export: a self-contained, params-baked top-k scorer.

`export_scorer` serializes the eval-time ranking computation
(`model.predict` last-position state x item table, `lax.top_k(20)`)
into a `jax.export` StableHLO artifact. One deliberate divergence from
the metric path: serving masks seen items (and the padding id 0) to
**-inf**, so a user's history can never appear in their served results
— the reference's `rating_pred[seen] = 0` quirk (`src/trainers.py:134`)
is kept only in the eval path (`ops/topk.py:masked_topk`) where HR/NDCG
parity requires it. Artifact properties:

- **params are baked in as constants** — the artifact is one file that
  needs no checkpoint, no model code, and no bsarec_tpu import to run;
- **batch-polymorphic** — lowered once with a symbolic batch dimension,
  so any batch size runs without retracing;
- **multi-platform** — lowered for both CPU and TPU, so the same blob
  serves from a CPU frontend or a TPU serving cell.

`load_scorer` deserializes and jits the artifact; serving hosts need
jax/jaxlib only. The reference has no serving path at all (its eval is
a host-side numpy argpartition, `src/trainers.py:142-149`).

Scope: the artifact materializes [b, V] logits (dense ranking), sized
for reference-scale catalogs (up to a few million items at serving
batch sizes). Million-to-10M-item catalogs should serve in-process via
the O(B)-memory streaming kernels (`ops/pallas_rank.py`), which are
TPU-Mosaic custom calls and deliberately not part of the portable
CPU+TPU artifact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SERVING_CALL_DOC = "(input_ids [b, L] i32, user_ids [b] i32, seen_items [b, S] i32) -> [b, 20] i32"


def serving_masked_topk(logits: jnp.ndarray, seen_items: jnp.ndarray, k: int = 20):
    """Serving-contract masking: seen ids AND the padding column 0 go to
    -inf before top-k, so history items can never outrank real
    candidates even when every unseen logit is negative. (seen_items is
    0-padded; pad entries land on column 0, which is masked anyway.)
    The metric/eval path instead keeps the reference's score:=0.0 quirk
    (`ops/topk.py:masked_topk`, `src/trainers.py:134`) — a parity
    requirement for HR/NDCG, not a serving contract."""
    batch = jnp.arange(logits.shape[0])[:, None]
    logits = logits.at[batch, seen_items].set(-jnp.inf)
    logits = logits.at[:, 0].set(-jnp.inf)
    return jax.lax.top_k(logits, k)


def quantize_rows(x):
    """[N, h] f32 -> symmetric per-row int8 + f32 scales."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    return jnp.round(x / scale[:, None]).astype(jnp.int8), scale


def int8_logits_prequant(state, q_table, t_scale):
    """Catalog matmul against a pre-quantized table: the [b, h] user
    states quantize dynamically per row; the int8 x int8 product runs
    on the int8 MXU path (2x the bf16 peak on v5e), accumulating in
    int32, with both scale vectors reapplied outside the matmul."""
    q_state, s_scale = quantize_rows(state)
    acc = jax.lax.dot_general(
        q_state, q_table,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * s_scale[:, None] * t_scale[None, :]


def int8_logits(state, table):
    """Quantized catalog matmul: symmetric per-row int8 for both the
    [b, h] user states (dynamic scales) and the [V, h] item table
    (static scales, folded into the artifact's constants at export).
    Per-row symmetric int8 keeps the ranking's relative error
    ~O(1/127) per factor."""
    q_table, t_scale = quantize_rows(table)
    return int8_logits_prequant(state.astype(jnp.float32), q_table, t_scale)


def build_scoring_fn(model, item_size: int, dtype: str = "float32", k: int = 20,
                     quant: str | None = None):
    """The serving ranking computation as a pure fn of params.

    Logits mirror `train/loop.py:build_eval_fn`'s dense branch (the
    tied-table matmul of `src/trainers.py:62-68`, `table[:item_size]`
    trimming BERT4Rec's [mask] column like `src/trainers.py:133-137`);
    masking uses the serving contract (`serving_masked_topk`: seen and
    padding ids to -inf), not the eval path's reference-parity zeroing.
    `quant='int8'` swaps the catalog matmul for `int8_logits`.
    """
    if quant not in (None, "int8"):
        raise ValueError(f"unknown serving quantization {quant!r}")

    def predict_and_table(mdl, ids, uids):
        return mdl.predict(ids, uids), mdl.item_table

    def score_topk(params, input_ids, user_ids, seen_items):
        out, table = model.apply(
            {"params": params}, input_ids, user_ids, method=predict_and_table
        )
        if quant == "int8":
            logits = int8_logits(out[:, -1, :], table[:item_size])
        else:
            dt = jnp.dtype(dtype)
            logits = jnp.einsum(
                "bh,vh->bv",
                out[:, -1, :].astype(dt),
                table[:item_size].astype(dt),
                preferred_element_type=jnp.float32,
            )
        _, topk_idx = serving_masked_topk(logits, seen_items, k=k)
        return topk_idx

    return score_topk


def export_scorer(model, params, item_size: int, max_len: int,
                  seen_width: int, path: str, dtype: str = "float32",
                  platforms=("cpu", "tpu"), quant: str | None = None) -> dict:
    """Serialize the params-baked scorer to `path`; returns metadata.

    `quant='int8'`: the item table is quantized at export (the static
    scales and int8 rows become the artifact's constants) and the
    catalog matmul serves on the int8 MXU path — see `int8_logits`.
    """
    from jax import export as jexport

    score_topk = build_scoring_fn(model, item_size, dtype=dtype, quant=quant)
    frozen = jax.device_get(params)  # baked as artifact constants

    def serve(input_ids, user_ids, seen_items):
        return score_topk(frozen, input_ids, user_ids, seen_items)

    (b,) = jexport.symbolic_shape("b")
    exp = jexport.export(jax.jit(serve), platforms=tuple(platforms))(
        jax.ShapeDtypeStruct((b, max_len), jnp.int32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b, seen_width), jnp.int32),
    )
    blob = exp.serialize()
    with open(path, "wb") as fh:
        fh.write(blob)
    return {
        "path": path, "bytes": len(blob), "call": SERVING_CALL_DOC,
        "platforms": list(platforms), "max_len": max_len,
        "seen_width": seen_width, "item_size": item_size,
        "quant": quant or "none",
    }


class Scorer:
    """A deserialized serving artifact. `topk(input_ids, user_ids,
    seen_items) -> [b, 20] ranked item ids` at any batch size."""

    def __init__(self, exported):
        self._exported = exported
        self._call = jax.jit(exported.call)

    def topk(self, input_ids, user_ids=None, seen_items=None) -> np.ndarray:
        input_ids = jnp.asarray(input_ids, jnp.int32)
        b = input_ids.shape[0]
        if user_ids is None:
            user_ids = jnp.zeros((b,), jnp.int32)
        if seen_items is None:  # mask nothing beyond the padding column
            seen_items = jnp.zeros((b, self.seen_width), jnp.int32)
        return np.asarray(self._call(
            input_ids, jnp.asarray(user_ids, jnp.int32),
            jnp.asarray(seen_items, jnp.int32),
        ))

    @property
    def max_len(self) -> int:
        return self._exported.in_avals[0].shape[1]

    @property
    def seen_width(self) -> int:
        return self._exported.in_avals[2].shape[1]


def load_scorer(path: str) -> Scorer:
    """Load a serving artifact written by `export_scorer`. Needs only
    jax/jaxlib — no model code, no checkpoint."""
    from jax import export as jexport

    with open(path, "rb") as fh:
        return Scorer(jexport.deserialize(bytearray(fh.read())))
