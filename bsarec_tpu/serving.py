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

Scope: four layouts, all returning identical rankings; measured at
1M x 64 x b256 in `results/r5_runs/serving_bench_r5.log`:

- `impl='bitmask'` (default, 7.9 ms): the seen mask becomes a u32
  bitmask + broadcast-expanded compare that XLA fuses into the slab
  pass (`bitmask_masked_topk`).
- `impl='dense'` (12.3 ms): classic [b, V] scatter-mask; the stage
  decomposition puts the scatter + full-slab rewrite at 10.8 ms of the
  12.3 — the catalog matmul itself is ~free at hidden 64, which is
  also why int8/bf16 quantization is a measured no-op at this shape.
- `impl='filtered'` (60 ms — kept as a documented negative result):
  masking in top-k space via an unmasked top-(k+S+1); exact, but
  k+S+1=71 leaves lax.top_k's fast small-k path and costs 5x dense.
- `impl='chunked'` (31 ms): streams the catalog in `item_chunk` blocks
  with per-chunk top-k + merge (`chunked_masked_topk`) — O(b*chunk)
  peak, for catalogs whose logits slab cannot exist; the
  memory-bounded layout, not the fast one.

Past that, 10M-item catalogs can serve in-process via the O(B)-memory
streaming kernels (`ops/pallas_rank.py`), TPU-Mosaic custom calls
deliberately not part of the portable CPU+TPU artifact.
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


def bitmask_masked_topk(logits: jnp.ndarray, seen_items: jnp.ndarray, k: int = 20):
    """Same contract and results as `serving_masked_topk`, with the
    [b, V] scatter replaced by a fusable compare: seen ids OR into a
    [b, ceil(V/32)] u32 bitmask (tiny scatter-add after an on-device
    row dedupe — distinct ids hit distinct (word, bit) pairs so add is
    OR), the bitmask broadcast-expands to per-column bits ([b, nw, 32]
    shift-AND then reshape — this form fuses into the masking `where`;
    an equivalent gather expansion does NOT fuse and loses), and one
    `where` masks seen + column 0 to -inf. Measured at 1M x 64 x b256
    (`results/r5_runs/serving_bench_r5.log`): 7.9 ms vs the scatter
    path's 12.3 ms (the scatter + full-slab rewrite was 10.8 ms of it)
    and vs 60 ms for masking in top-k space (`filtered_masked_topk`,
    whose top-(k+S+1) leaves the fast small-k top_k path)."""
    b, v = logits.shape
    nw = (v + 31) // 32
    sd = jnp.sort(seen_items.astype(jnp.int32), axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((b, 1), bool), sd[:, 1:] == sd[:, :-1]], axis=1)
    sd = jnp.where(dup, 0, sd)
    word = jnp.where(sd > 0, sd // 32, nw)  # padding ids -> dump word
    contrib = jnp.where(
        sd > 0, jnp.uint32(1) << (sd % 32).astype(jnp.uint32), jnp.uint32(0))
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], sd.shape)
    bm = jnp.zeros((b, nw + 1), jnp.uint32).at[rows, word].add(contrib)[:, :nw]
    bits = (bm[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
    is_seen = bits.reshape(b, -1)[:, :v]
    cols = jnp.arange(v, dtype=jnp.int32)
    masked = jnp.where((is_seen == 1) | (cols[None, :] == 0), -jnp.inf, logits)
    return jax.lax.top_k(masked, k)


def filtered_masked_topk(logits: jnp.ndarray, seen_items: jnp.ndarray, k: int = 20):
    """Same contract and results as `serving_masked_topk`, without ever
    touching the [b, V] slab after the matmul: take the top-(k+S+1) of
    the RAW logits (S = seen_items width, +1 for the padding column),
    then drop winners that are seen or id 0 in a [b, k+S+1] op and
    re-top-k. Exact, not approximate: at most S+1 winners can be
    removed, so the surviving k are precisely the masked top-k, and
    `lax.top_k`'s index-ascending tie order is preserved through both
    passes. Motivation (measured, `results/r5_runs/serving_bench_r5.log`
    stage rows at 1M x 64 x b256): the dense path's scatter-mask +
    full-slab rewrite is 10.8 ms of its 12.3 ms total — the catalog
    matmul itself is ~free — so masking in top-k space removes ~85% of
    the artifact's cost."""
    s = seen_items.shape[1]
    kk = k + s + 1
    if kk > logits.shape[1]:  # degenerate catalogs: the slab is tiny anyway
        return serving_masked_topk(logits, seen_items, k=k)
    vals, ids = jax.lax.top_k(logits, kk)
    bad = jnp.any(ids[:, :, None] == seen_items[:, None, :], axis=-1) | (ids == 0)
    vals = jnp.where(bad, -jnp.inf, vals)
    fvals, floc = jax.lax.top_k(vals, k)
    return fvals, jnp.take_along_axis(ids, floc, axis=1)


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


def chunked_masked_topk(state_pack, tables, logits_fn, seen_items, v: int,
                        k: int = 20, item_chunk: int = 65536):
    """Streaming serving top-k: scan the catalog in `item_chunk`-row
    blocks, per-chunk top-k, one final merge — peak [b, item_chunk]
    instead of [b, V], and the full logits slab never exists. Pure lax
    (scan + dynamic_slice + top_k), so it exports to the portable
    CPU+TPU artifact — unlike the Pallas streaming kernels
    (`ops/pallas_rank.py`), which stay in-process.

    state_pack: per-request precomputed operands (e.g. the [b, h] state,
    or its int8 quantization) closed over by `logits_fn(state_pack,
    *table_slices) -> [b, item_chunk] f32`. tables: arrays sliced along
    dim 0 per chunk (the item table, int8 rows + scales, ...). Seen ids
    and the padding column mask to -inf as in `serving_masked_topk`
    (out-of-chunk scatters land on a dump column)."""
    n_chunks = -(-v // item_chunk)
    k_eff = min(k, item_chunk)  # a chunk can hold at most item_chunk hits
    if n_chunks * k_eff < k:
        raise ValueError(
            f"item_chunk={item_chunk} too small to surface top-{k} over "
            f"{v} items ({n_chunks} chunks x {k_eff} kept)"
        )
    pad_v = n_chunks * item_chunk
    tables = tuple(
        jnp.pad(t, ((0, pad_v - v),) + ((0, 0),) * (t.ndim - 1)) for t in tables
    )
    b = seen_items.shape[0]

    def body(_, c):
        start = c * item_chunk
        slices = tuple(
            jax.lax.dynamic_slice_in_dim(t, start, item_chunk, 0) for t in tables
        )
        logits = logits_fn(state_pack, *slices)  # [b, item_chunk] f32
        gids = start + jnp.arange(item_chunk, dtype=jnp.int32)
        logits = jnp.where((gids >= 1) & (gids < v), logits, -jnp.inf)
        local = seen_items - start
        dump = jnp.where((local >= 0) & (local < item_chunk), local, item_chunk)
        ext = jnp.concatenate([logits, jnp.zeros((b, 1), logits.dtype)], axis=1)
        ext = ext.at[jnp.arange(b)[:, None], dump].set(-jnp.inf)
        vals, loc = jax.lax.top_k(ext[:, :item_chunk], k_eff)
        return None, (vals, start + loc)

    _, (vals, ids) = jax.lax.scan(body, None, jnp.arange(n_chunks))
    vals = jnp.moveaxis(vals, 0, 1).reshape(b, -1)  # [b, n_chunks*k]
    ids = jnp.moveaxis(ids, 0, 1).reshape(b, -1)
    mvals, mloc = jax.lax.top_k(vals, k)
    return mvals, jnp.take_along_axis(ids, mloc, axis=1)


def build_scoring_fn(model, item_size: int, dtype: str = "float32", k: int = 20,
                     quant: str | None = None, impl: str = "bitmask",
                     item_chunk: int = 65536):
    """The serving ranking computation as a pure fn of params.

    Logits mirror `train/loop.py:build_eval_fn`'s dense branch (the
    tied-table matmul of `src/trainers.py:62-68`, `table[:item_size]`
    trimming BERT4Rec's [mask] column like `src/trainers.py:133-137`);
    masking uses the serving contract (`serving_masked_topk`: seen and
    padding ids to -inf), not the eval path's reference-parity zeroing.
    `quant='int8'` swaps the catalog matmul for `int8_logits`.
    `impl` picks the masking/streaming layout — 'bitmask' (CLI
    default, fastest measured), 'dense', 'filtered', 'chunked'; all
    return identical rankings (see the module docstring's measured
    matrix).
    """
    if quant not in (None, "int8"):
        raise ValueError(f"unknown serving quantization {quant!r}")
    if impl not in ("bitmask", "dense", "filtered", "chunked"):
        raise ValueError(f"unknown serving impl {impl!r}")

    def predict_and_table(mdl, ids, uids):
        return mdl.predict(ids, uids), mdl.item_table

    def score_topk(params, input_ids, user_ids, seen_items):
        out, table = model.apply(
            {"params": params}, input_ids, user_ids, method=predict_and_table
        )
        state = out[:, -1, :]
        tbl = table[:item_size]
        dt = jnp.dtype(dtype)
        if impl == "chunked":
            if quant == "int8":
                q_table, t_scale = quantize_rows(tbl)
                q_state, s_scale = quantize_rows(state.astype(jnp.float32))

                def logits_fn(pack, qt, ts):
                    qs, ss = pack
                    acc = jax.lax.dot_general(
                        qs, qt, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    return acc.astype(jnp.float32) * ss[:, None] * ts[None, :]

                _, topk_idx = chunked_masked_topk(
                    (q_state, s_scale), (q_table, t_scale), logits_fn,
                    seen_items, item_size, k=k, item_chunk=item_chunk)
            else:
                def logits_fn(st, t_slice):
                    return jnp.einsum(
                        "bh,vh->bv", st, t_slice.astype(dt),
                        preferred_element_type=jnp.float32,
                    )

                _, topk_idx = chunked_masked_topk(
                    state.astype(dt), (tbl,), logits_fn,
                    seen_items, item_size, k=k, item_chunk=item_chunk)
            return topk_idx
        if quant == "int8":
            logits = int8_logits(state, tbl)
        else:
            logits = jnp.einsum(
                "bh,vh->bv", state.astype(dt), tbl.astype(dt),
                preferred_element_type=jnp.float32,
            )
        mask_topk = {"bitmask": bitmask_masked_topk,
                     "filtered": filtered_masked_topk,
                     "dense": serving_masked_topk}[impl]
        _, topk_idx = mask_topk(logits, seen_items, k=k)
        return topk_idx

    return score_topk


def export_scorer(model, params, item_size: int, max_len: int,
                  seen_width: int, path: str, dtype: str = "float32",
                  platforms=("cpu", "tpu"), quant: str | None = None,
                  impl: str = "bitmask", item_chunk: int = 65536) -> dict:
    """Serialize the params-baked scorer to `path`; returns metadata.

    `quant='int8'`: the item table is quantized at export (the static
    scales and int8 rows become the artifact's constants) and the
    catalog matmul serves on the int8 MXU path — see `int8_logits`.
    `impl='chunked'`: stream the catalog in `item_chunk` blocks
    (`chunked_masked_topk`) — the big-catalog serving path.
    """
    from jax import export as jexport

    score_topk = build_scoring_fn(model, item_size, dtype=dtype, quant=quant,
                                  impl=impl, item_chunk=item_chunk)
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
        "quant": quant or "none", "impl": impl,
        "item_chunk": item_chunk if impl == "chunked" else None,
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
