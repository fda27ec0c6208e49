"""Streaming full-catalog top-k retrieval (Pallas TPU kernel).

Replaces the eval path's [B, V] score materialization with a single
vocab sweep: each grid step computes one [Bt, Vt] logit tile on the
MXU, applies the seen-item mask (reference semantics: seen scores set
to 0.0, `src/trainers.py:134`), and folds the tile into a running
top-k held in VMEM scratch. HBM traffic is one read of the item table
per batch tile plus a 32×-compressed seen bitmask — never B·V scores.

Seen items arrive as a packed bitmask ([B, Vp/32] int32, built once
per eval split by `build_seen_bitmask`), expanded in-kernel with
`pltpu.repeat` + shift/mask ops. The layout is bit-plane-per-tile:
within a vocab tile of TILE_COLS items (W = TILE_COLS/32 words), bit r
of word w covers tile-local item r*W + w — exactly what a tiled
32x-repeat of the word block recovers lane-for-lane.

The running top-k merge is *counted*: per tile, C = the worst row's
number of candidates strictly above that row's current k-th value, and
the extraction loop (row-max + sorted insertion via roll-shift) runs
exactly min(C, k) rounds. After the first few tiles C is 0-2, so the
sweep stays close to its matmul + masking cost. Measured on v5e at
1M x 64 f32, B=256: 4.4 ms per sweep (~58k ranked users/s) vs 3.1 ms
for the maskless sweep alone; a fixed k-round merge costs 15+ ms.

Tie-breaking picks the smallest item id among equal scores, which can
differ from `np.argpartition` order; HR/NDCG are unaffected except on
exact score ties.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
KPAD = 128  # running top-k scratch width (lane-aligned); k <= KPAD
INT_MAX = 2**31 - 1  # python literal: jnp constants would be captured as kernel consts


TILE_COLS = 4096  # vocab-tile width; W = TILE_COLS // 32 = 128 lanes of mask words


def build_seen_bitmask(seen_items: np.ndarray, vocab_size: int,
                       id_offset: int = 0, mask_item0: bool = True) -> np.ndarray:
    """[B, S] 0-padded seen-item lists -> [B, Vp/32] int32 bitmask
    (Vp = vocab_size rounded up to TILE_COLS), bit-plane-per-tile layout:
    item v lives in word (v // TILE_COLS) * W + (v % TILE_COLS) % W at
    bit (v % TILE_COLS) // W, W = TILE_COLS // 32.

    With `mask_item0` the padding item's bit (item 0 -> word 0, bit 0)
    is always set: the reference's 0-padded seen lists zero column 0
    for every user (`src/trainers.py:134`). `id_offset` shifts ids into
    shard-local coordinates for vocab-sharded tables (ids outside
    [0, vocab_size) after the shift are dropped; global padding id 0 is
    always dropped).
    """
    from bsarec_tpu import native

    fast = native.seen_bitmask(
        np.asarray(seen_items), vocab_size, TILE_COLS, id_offset, mask_item0
    )
    if fast is not None:
        return fast

    w = TILE_COLS // 32
    vp = -(-vocab_size // TILE_COLS) * TILE_COLS
    out = np.zeros((seen_items.shape[0], vp // 32), np.uint32)
    if mask_item0:
        out[:, 0] |= 1  # item 0
    rows = np.repeat(np.arange(seen_items.shape[0]), seen_items.shape[1])
    raw = seen_items.reshape(-1).astype(np.int64)
    ids = raw - id_offset
    keep = (raw > 0) & (ids >= 0) & (ids < vocab_size)
    rows, ids = rows[keep], ids[keep]
    u = ids % TILE_COLS
    words = (ids // TILE_COLS) * w + u % w
    bits = (u // w).astype(np.uint32)
    np.bitwise_or.at(out, (rows, words), np.uint32(1) << bits)
    return out.view(np.int32)


# Above this many bytes of staged [num_users, Vp/32] bitmasks (valid +
# test splits together), the Trainer keeps the tiny [U, S] seen-id lists
# in HBM instead and builds each batch's [B, Vp/32] bitmask on device
# inside the eval scan (`seen_ids_to_bitmask`). 256 MiB keeps the
# prebuilt fast path for every mounted dataset (Beauty: 2 x 34 MB)
# while a 1M-item x 50k-user catalog (2 x 6.25 GB — the round-4
# million_item_e2e OOM) switches to O(B·V) transient masks.
SEEN_BITMASK_STAGE_LIMIT = 256 * 2**20


def dedupe_seen_rows(seen_items: np.ndarray) -> np.ndarray:
    """Zero duplicate ids within each row (host-side, vectorized).

    `seen_ids_to_bitmask` ORs single-bit contributions with a
    scatter-ADD, which is only OR when each (row, id) appears once —
    user histories can repeat items, so rows are deduplicated at
    staging time. Returns a sorted, 0-padded copy (row order is
    irrelevant to masking)."""
    s = np.sort(seen_items.astype(np.int32), axis=1)
    dup = np.zeros_like(s, dtype=bool)
    dup[:, 1:] = s[:, 1:] == s[:, :-1]
    s[dup] = 0
    return s


def seen_ids_to_bitmask(seen_ids, vocab_size: int):
    """Device-side `build_seen_bitmask`: [B, S] 0-padded seen-id lists
    (UNIQUE per row — see `dedupe_seen_rows`) -> [B, Vp/32] int32
    bitmask in the same bit-plane-per-tile layout.

    Built per eval batch inside the jitted eval scan, so the staged
    footprint is the O(U·S) id lists instead of the O(U·Vp/32) host
    bitmask — at 1M items x 50k users that is 3 MB resident + 32 MB
    transient per batch vs 2 x 6.25 GB staged (which RESOURCE_EXHAUSTs
    the chip). The OR is a scatter-add of per-id single-bit words:
    distinct ids always land on distinct (word, bit) pairs, so with
    unique rows no carries can occur. Padding (id 0) routes to a dump
    word that is sliced off; item 0's bit is then set unconditionally
    (reference semantics: 0-padded seen lists zero column 0 for every
    user, `src/trainers.py:134`)."""
    b, s = seen_ids.shape
    w = TILE_COLS // 32
    vp = -(-vocab_size // TILE_COLS) * TILE_COLS
    nw = vp // 32
    ids = seen_ids.astype(jnp.int32)
    u = ids % TILE_COLS
    word = (ids // TILE_COLS) * w + u % w
    bit = (u // w).astype(jnp.uint32)
    valid = ids > 0
    word = jnp.where(valid, word, nw)  # padding -> dump word
    contrib = jnp.where(valid, jnp.uint32(1) << bit, jnp.uint32(0))
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, s))
    out = jnp.zeros((b, nw + 1), jnp.uint32)
    out = out.at[rows, word].add(contrib)
    # item 0 = word 0 bit 0, and no id > 0 maps there: add == OR
    out = out[:, :nw].at[:, 0].add(jnp.uint32(1))
    return jax.lax.bitcast_convert_type(out, jnp.int32)


def build_seen_bitmask_sharded(seen_items: np.ndarray, vocab_size: int,
                               n_shards: int) -> np.ndarray:
    """Per-shard bitmask stack [n_shards, B, rows_p/32] for a vocab
    row-sharded table (shard s owns global rows [s·rows, (s+1)·rows),
    rows = vocab_size / n_shards). Shard the result P(model, data, None)
    and each device's slice is exactly `build_seen_bitmask` of its own
    rows in shard-local coordinates."""
    assert vocab_size % n_shards == 0, (vocab_size, n_shards)
    rows = vocab_size // n_shards
    return np.stack(
        [
            build_seen_bitmask(
                seen_items, rows, id_offset=s * rows, mask_item0=(s == 0)
            )
            for s in range(n_shards)
        ]
    )


def _rank_kernel(k, vocab_major, nv_ref, s_ref, t_ref, m_ref, vals_ref,
                 ids_ref, rv_all, ri_all):
    # Two grid orders (static choice in streaming_masked_topk):
    # - batch-major (vocab inner): best pipeline overlap, but re-reads
    #   the whole table once per batch tile — right when the table is
    #   small or there is a single batch tile;
    # - vocab-major (batch inner): each table tile is fetched ~once, so
    #   HBM traffic stops scaling with batch tiles — measured 13% faster
    #   at 10M x 256 (table reads ~90% of the sweep) and 40% slower at
    #   1M x 64 (revisit bubbles; compute-bound there).
    # The running top-k state lives in a full-batch scratch either way.
    if vocab_major:
        j, i = pl.program_id(0), pl.program_id(1)
        nj = pl.num_programs(0)
    else:
        i, j = pl.program_id(0), pl.program_id(1)
        nj = pl.num_programs(1)
    bt = s_ref.shape[0]
    vt = t_ref.shape[0]
    n_valid = nv_ref[0]
    rv_sc = rv_all.at[pl.ds(i * bt, bt), :]
    ri_sc = ri_all.at[pl.ds(i * bt, bt), :]

    @pl.when(j == 0)
    def _():
        rv_sc[:] = jnp.full_like(rv_sc[:], NEG_INF)
        ri_sc[:] = jnp.zeros_like(ri_sc[:])

    logits = jax.lax.dot_general(
        s_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cols = j * vt + jax.lax.broadcasted_iota(jnp.int32, (bt, vt), 1)

    # expand packed seen bits (bit-plane layout, see build_seen_bitmask):
    # tiled 32x repeat puts word (u % W) at lane u; its bit (u // W) is
    # the seen flag for tile-local item u
    words = m_ref[:]  # [bt, W = vt // 32] int32
    expanded = pltpu.repeat(words, 32, axis=1)  # [bt, vt], lane u = word u % W
    bitpos = jax.lax.broadcasted_iota(jnp.int32, (bt, vt), 1) // (vt // 32)
    seen = jax.lax.shift_right_logical(expanded, bitpos) & 1
    logits = jnp.where(seen == 1, 0.0, logits)  # reference: seen -> 0.0
    logits = jnp.where(cols < n_valid, logits, NEG_INF)  # catalog padding

    # counted merge: per row, only candidates strictly above the row's
    # current k-th value can change its top-k. C = worst row's candidate
    # count bounds the extraction rounds — after the first few tiles C is
    # 0-2, so the expensive [bt, vt] extraction passes almost never run
    # more than once or twice (a fixed k-round merge costs ~5x the whole
    # matmul sweep).
    slot = jax.lax.broadcasted_iota(jnp.int32, rv_sc.shape, 1)
    kth = jnp.max(jnp.where(slot == k - 1, rv_sc[:], NEG_INF), axis=-1, keepdims=True)
    n_cand = jnp.max(jnp.sum((logits > kth).astype(jnp.int32), axis=-1))

    def merge_round(_, carry):
        cand_v, run_v, run_i = carry
        cm = jnp.max(cand_v, axis=-1, keepdims=True)  # [bt, 1]
        sel = cand_v == cm
        # extracted id: smallest col among row maxima (deterministic ties)
        cid = jnp.min(jnp.where(sel, cols, INT_MAX), axis=-1, keepdims=True)
        cand_v = jnp.where(sel & (cols == cid), NEG_INF, cand_v)  # kill it
        # insert (cm, cid) into the sorted run at position = number of
        # entries >= cm; rows whose cm doesn't beat their kth insert
        # beyond slot k-1 harmlessly (KPAD > k keeps real slots intact)
        pos = jnp.sum((run_v >= cm).astype(jnp.int32), axis=-1, keepdims=True)
        run_v = jnp.where(
            slot < pos, run_v, jnp.where(slot == pos, cm, pltpu.roll(run_v, 1, axis=1))
        )
        run_i = jnp.where(
            slot < pos, run_i, jnp.where(slot == pos, cid, pltpu.roll(run_i, 1, axis=1))
        )
        return cand_v, run_v, run_i

    @pl.when(n_cand > 0)
    def _():
        _, run_v, run_i = jax.lax.fori_loop(
            0,
            jnp.minimum(n_cand, k),  # k rounds always suffice: only k slots
            merge_round,
            (logits, rv_sc[:], ri_sc[:]),
        )
        rv_sc[:] = run_v
        ri_sc[:] = run_i

    @pl.when(j == nj - 1)
    def _():
        vals_ref[:] = rv_sc[:, : vals_ref.shape[1]]
        ids_ref[:] = ri_sc[:, : ids_ref.shape[1]]


def streaming_masked_topk(
    states: jnp.ndarray,  # [B, H] f32
    table: jnp.ndarray,  # [V, H] f32
    seen_bitmask: jnp.ndarray,  # [B, Vp/32] int32 (build_seen_bitmask)
    k: int = 20,
    n_valid: int | None = None,
    block_b: int | None = None,  # None: VMEM-budgeted (below)
    interpret: bool | None = None,  # None: interpret off-TPU (CPU tests)
):
    """Returns (values [B, k], item ids [B, k]) of the masked catalog scores."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h = states.shape
    v = table.shape[0]
    n_valid = v if n_valid is None else n_valid
    if block_b is None:
        # the vocab-major grid reads each table tile once regardless of
        # batch tiling, so bt=128 ([bt, 4096] f32/i32 live tiles fit
        # 16M VMEM at every h) is always right
        block_b = 128
    bt = min(block_b, max(8, b))
    assert k <= KPAD
    # the bitmask layout (and Mosaic's 128-lane block constraint) fixes
    # the vocab tile width to TILE_COLS
    vt = TILE_COLS
    bp = pl.cdiv(b, bt) * bt
    vp = pl.cdiv(v, vt) * vt

    sp = jnp.pad(states, ((0, bp - b), (0, 0))) if bp != b else states
    tp = jnp.pad(table, ((0, vp - v), (0, 0))) if vp != v else table
    wp = vp // 32
    mp = seen_bitmask
    if mp.shape[1] < wp:
        mp = jnp.pad(mp, ((0, 0), (0, wp - mp.shape[1])))
    if bp != b:
        mp = jnp.pad(mp, ((0, bp - b), (0, 0)))

    # vocab-major pays off once the per-batch-tile table re-read
    # dominates (huge tables, multiple batch tiles); see _rank_kernel
    vocab_major = bp // bt > 1 and v * h * table.dtype.itemsize > (2 << 30)
    vals, ids = pl.pallas_call(
        functools.partial(_rank_kernel, k, vocab_major),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(
                (vp // vt, bp // bt) if vocab_major else (bp // bt, vp // vt)
            ),
            in_specs=[
                pl.BlockSpec((bt, h), (lambda j, i, *_: (i, 0)) if vocab_major else (lambda i, j, *_: (i, 0)), memory_space=pltpu.VMEM),
                pl.BlockSpec((vt, h), (lambda j, i, *_: (j, 0)) if vocab_major else (lambda i, j, *_: (j, 0)), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (bt, vt // 32), (lambda j, i, *_: (i, j)) if vocab_major else (lambda i, j, *_: (i, j)), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=(
                pl.BlockSpec((bt, k), (lambda j, i, *_: (i, 0)) if vocab_major else (lambda i, j, *_: (i, 0)), memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, k), (lambda j, i, *_: (i, 0)) if vocab_major else (lambda i, j, *_: (i, 0)), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((bp, KPAD), jnp.float32),
                pltpu.VMEM((bp, KPAD), jnp.int32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, k), jnp.float32),
            jax.ShapeDtypeStruct((bp, k), jnp.int32),
        ),
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32), sp, tp, mp)
    return vals[:b], ids[:b]
