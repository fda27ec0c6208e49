"""Streaming full-vocabulary softmax cross-entropy (Pallas TPU kernels).

The reference computes full-vocab CE by materializing the [B, V] logit
matrix (`src/model/bsarec.py:33-35`, `torch.nn.CrossEntropyLoss`). XLA
does the same: forward keeps [B, V] logits alive for the backward, so
HBM traffic and peak memory scale with B·V — prohibitive for the
10M-item production catalogs this framework targets (256 × 10M × 4 B
≈ 10 GB per step).

These kernels stream the item table through VMEM with online-softmax
max/sum rescaling (à la flash attention): memory is O(B + tile) and
the table is read exactly once per pass. The custom VJP recomputes
tile logits in the backward (FLOPs are nearly free on the MXU at these
shapes; HBM bandwidth is the scarce resource) and folds the one-hot
label corrections into the same sweeps:

    d_states = ((softmax − onehot(answers)) @ table) · dloss
    d_table  = ((softmax − onehot(answers)) · dloss)ᵀ @ states

Numerics match the dense path at f32.

Hard-won implementation rules (measured on v5e, 1M-item catalog):

1. MANUAL double-buffered DMA pipeline. Mosaic's automatic grid
   pipelining collapses to latency-bound serial DMAs (~20× slower) as
   soon as a kernel has more than one grid-invariant VMEM operand —
   and these kernels need several (states + answers/logZ/dloss). So
   the table stays in HBM and tiles are DMA'd into two whole-buffer
   VMEM scratches inside an unroll-by-2 `fori_loop`. The backward is
   ONE fused sweep producing both gradients (round 1 ran two: one per
   gradient — 2 table reads + 2 softmax recomputes); the validity
   compare/select runs only on the <= 2 tiles containing the n_valid
   boundary (`j_clean` predication); with dtype="bfloat16" the tile
   dots run at the MXU's bf16 rate. Current numbers: BASELINE.md
   "streaming kernel" rows (re-measured per round).

2. NO host-side gathers: `table[answers]` on a 1M-row table costs
   ~4.5 ms in XLA (latency-bound row DMAs). The gold logit is instead
   accumulated in-sweep via a `cols == answer` compare; the backward's
   scatter-add via the in-kernel one-hot subtraction.

3. Per-row scalars enter as 128-lane replicated [B, 128] blocks, read
   back with a full-width max ([Bt, 1] operands force slow relayouts).

4. LANE PACKING: DMA row-slices of an H=64 array are illegal (Mosaic
   pads the lane dim to 128; partial-lane slices are rejected), so the
   caller reshapes the table to [V/pack, 128] (a free row-major view,
   pack = 128/H) and the kernels compute `pack` interleaved logit
   columns per packed row using zero-padded state vectors:
   lanes [k·H, (k+1)·H) of packed row r hold item pack·r + k, and
   s_k = [0…0 | s | 0…0] makes dot(s_k, packed_rowᵀ) = ⟨s, T[pack·r+k]⟩.
   All dots contract the full 128 lanes; no value or DMA slicing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
LANES = 128


def _pad_to(x: jnp.ndarray, size: int, axis: int, value=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _wide(x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """[B] per-row scalars -> [B, 128] lane-replicated block operand."""
    x = x if dtype is None else x.astype(dtype)
    return jnp.broadcast_to(x[:, None], (x.shape[0], LANES))


def _narrow(x: jnp.ndarray) -> jnp.ndarray:
    """Read a lane-replicated [bt, 128] block back as [bt, 1]."""
    return jnp.max(x, axis=-1, keepdims=True)


def _s_shifted(s, h, pack):
    """[bt, h] states -> list of `pack` zero-padded [bt, 128] vectors,
    s_k nonzero exactly on lanes [k*h, (k+1)*h)."""
    bt = s.shape[0]
    if pack == 1:
        return [s]
    zero = jnp.zeros((bt, h), s.dtype)
    return [
        jnp.concatenate([zero] * k + [s] + [zero] * (pack - 1 - k), axis=1)
        for k in range(pack)
    ]


def _lane_mask(k, h, shape):
    """Boolean [*, 128] mask selecting lanes [k*h, (k+1)*h)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return (lane >= k * h) & (lane < (k + 1) * h)


def _sweep(t_hbm, tbuf0, tbuf1, sem, nj, rows, step_fn):
    """Double-buffered streaming loop over row-tiles of t_hbm.

    step_fn(j, tile) consumes tile j ([rows, 128] VMEM view) while tile
    j+1 is in flight. Two whole-buffer scratches + an unroll-by-2 loop;
    nj must be even (callers pad the table accordingly).
    """

    def get_dma(buf, slot, jj):
        return pltpu.make_async_copy(
            t_hbm.at[pl.ds(jj * rows, rows), :], buf, sem.at[slot]
        )

    get_dma(tbuf0, 0, 0).start()

    def body(jj2, _):
        j0 = 2 * jj2

        get_dma(tbuf1, 1, j0 + 1).start()
        get_dma(tbuf0, 0, j0).wait()
        step_fn(j0, tbuf0[:])

        @pl.when(j0 + 2 < nj)
        def _():
            get_dma(tbuf0, 0, j0 + 2).start()

        get_dma(tbuf1, 1, j0 + 1).wait()
        step_fn(j0 + 1, tbuf1[:])
        return 0

    jax.lax.fori_loop(0, nj // 2, body, 0)


# --------------------------------------------------------------------------
# gold-row gather: the answers' table rows via an auto-pipelined
# [1, 128]-block gather (grid index = scalar-prefetched packed row id).
# XLA's own `table[answers]` costs ~4.5 ms on a 1M-row table; keeping
# the gold compare in the main sweeps costs ~3 VPU passes over B x V.
# This kernel does it in ~b pipelined row DMAs instead.
# --------------------------------------------------------------------------


RING = 8  # in-flight row DMAs in the gather (hides per-DMA latency)


def _gather_kernel(nring, idx_ref, t_hbm, out_ref, sem):
    b = out_ref.shape[0] // 8

    def dma(i):
        r0 = (idx_ref[i] // 8) * 8  # HBM tiling: slices must align to 8 rows
        return pltpu.make_async_copy(
            t_hbm.at[pl.ds(r0, 8), :], out_ref.at[pl.ds(8 * i, 8), :],
            sem.at[i % nring],
        )

    for k in range(nring):
        dma(k).start()

    def body(i, _):
        dma(i).wait()

        @pl.when(i + nring < b)
        def _():
            dma(i + nring).start()

        return 0

    jax.lax.fori_loop(0, b, body, 0)


def _gather_rows(table2, idx, interpret):
    """table2: [R, lanes]; idx: [b] int32 packed-row ids (pre-clipped).
    Returns [b, lanes] rows.

    Ring of manual [8, lanes] DMAs of the aligned block around each row
    (HBM tiling requires 8-row-aligned slices; a (1, 128)-block
    auto-pipelined gather is likewise rejected, and XLA's own gather
    costs ms — see header), then a [b, 8]-select picks the row."""
    b = idx.shape[0]
    lanes = table2.shape[1]
    nring = min(RING, b)
    blocks = pl.pallas_call(
        functools.partial(_gather_kernel, nring),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nring,))],
        out_shape=jax.ShapeDtypeStruct((8 * b, lanes), table2.dtype),
        interpret=interpret,
    )(idx, table2)
    win = blocks.reshape(b, 8, lanes)
    return jnp.take_along_axis(
        win, (idx % 8)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]


def _gold_rows(table2, answers, h, pack, interpret):
    """[b, h] f32 table rows of `answers` (clipped; callers mask a < 0)."""
    r_total = table2.shape[0]
    idx = jnp.clip(answers // pack, 0, r_total - 1).astype(jnp.int32)
    rows = _gather_rows(table2, idx, interpret).astype(jnp.float32)
    if pack == 1:
        return rows
    win = rows.reshape(rows.shape[0], pack, h)
    k = jnp.clip(answers, 0, None) % pack
    return jnp.take_along_axis(win, k[:, None, None].astype(jnp.int32), axis=1)[:, 0]


# --------------------------------------------------------------------------
# forward: per-row logZ in one streaming sweep (gold handled outside)
# --------------------------------------------------------------------------


def _fwd_kernel(n_valid, vt, nj, h, pack, cdt, s_ref, t_hbm, z_ref,
                tbuf0, tbuf1, sem, m_sc, s_sc):
    bt = s_ref.shape[0]
    rows = vt // pack
    # tiles strictly below j_clean contain no column >= n_valid, so they
    # skip the iota + validity compare/select entirely (the boundary +
    # padding tiles — at most the last two — take the masked branch);
    # with the gold logit gathered outside the sweep, a clean tile is
    # just dot -> max -> exp -> sum
    j_clean = n_valid // vt
    m_sc[:] = jnp.full_like(m_sc, NEG_INF)
    s_sc[:] = jnp.zeros_like(s_sc)
    s_k = _s_shifted(s_ref[:].astype(cdt), h, pack)

    def tile_update(j, tile, mask_nv: bool):
        tile = tile.astype(cdt)
        m_old = _narrow(m_sc[:])
        m_new = m_old
        parts = []
        for k in range(pack):
            logits = jax.lax.dot_general(
                s_k[k], tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if mask_nv:
                cols = (
                    j * vt
                    + pack * jax.lax.broadcasted_iota(jnp.int32, (bt, rows), 1)
                    + k
                )
                logits = jnp.where(cols < n_valid, logits, NEG_INF)
            parts.append(logits)
            m_new = jnp.maximum(m_new, jnp.max(logits, axis=-1, keepdims=True))
        scale = jnp.exp(m_old - m_new)  # exp(-inf - m) = 0 on the first tile
        s_new = _narrow(s_sc[:]) * scale
        for logits in parts:
            s_new = s_new + jnp.sum(jnp.exp(logits - m_new), axis=-1, keepdims=True)
        m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)
        s_sc[:] = jnp.broadcast_to(s_new, s_sc.shape)

    def step(j, tile):
        @pl.when(j < j_clean)
        def _():
            tile_update(j, tile, False)

        @pl.when(j >= j_clean)
        def _():
            tile_update(j, tile, True)

    _sweep(t_hbm, tbuf0, tbuf1, sem, nj, rows, step)
    logz = jnp.log(_narrow(s_sc[:])) + _narrow(m_sc[:])
    z_ref[:] = jnp.broadcast_to(logz, z_ref.shape)


def _run_fwd(states, table2, a128, n_valid, bt, vt, h, pack, cdt, interpret):
    b = states.shape[0]
    lanes = table2.shape[1]  # = h * pack
    nj = table2.shape[0] // (vt // pack)
    wide = pl.BlockSpec((bt, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    logz = pl.pallas_call(
        functools.partial(_fwd_kernel, n_valid, vt, nj, h, pack, cdt),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # packed table stays in HBM
        ],
        out_specs=wide,
        scratch_shapes=[
            pltpu.VMEM((vt // pack, lanes), table2.dtype),
            pltpu.VMEM((vt // pack, lanes), table2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((bt, LANES), jnp.float32),
            pltpu.VMEM((bt, LANES), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((b, LANES), jnp.float32),
        interpret=interpret,
    )(states, table2)
    logz = logz[:, 0]
    # gold = <s, T[a]> via the row gather; a < 0 (padded batch rows /
    # off-shard answers in the sharded composition) contributes 0.
    # Operands round to cdt first so gold matches the in-sweep logits'
    # compute dtype (bf16 mode), with f32 accumulation like the MXU.
    a = _narrow(a128)[:, 0]
    gold_row = _gold_rows(table2, a, h, pack, interpret)
    gold = jnp.sum(
        gold_row.astype(cdt).astype(jnp.float32)
        * states.astype(cdt).astype(jnp.float32),
        axis=-1,
    )
    gold = jnp.where(a >= 0, gold, 0.0)
    return logz - gold, logz


# --------------------------------------------------------------------------
# backward: ONE streaming sweep recomputing tile logits and producing
# BOTH gradients (the table is read once, the softmax recompute is
# shared — previously two sweeps cost 2 table reads + 2 recomputes)
# --------------------------------------------------------------------------


def _pd_tile(n_valid, vt, pack, j, k, s_k, tile, z, d, mask_nv: bool):
    """softmax·dloss for interleave k: [bt, vt // pack]. The onehot
    label subtraction happens OUTSIDE the sweep (a b-row correction,
    not a B x V compare): ds -= d·T[a] and dt[a_i] -= d_i·s_i."""
    bt = s_k.shape[0]
    rows = vt // pack
    logits = jax.lax.dot_general(
        s_k, tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jnp.exp(logits - z)
    if mask_nv:
        cols = (
            j * vt + pack * jax.lax.broadcasted_iota(jnp.int32, (bt, rows), 1) + k
        )
        p = jnp.where(cols < n_valid, p, 0.0)
    return p * d


def _grads_kernel(n_valid, vt, nj, h, pack, cdt, arow_ref, s_hbm, z_hbm,
                  d_hbm, corr_hbm, t_hbm, ds_ref, dt_hbm, tbuf0, tbuf1, tsem,
                  obuf0, obuf1, osem, s_vm, z_vm, d_vm, corr_vm, insem, acc,
                  rmw_buf, rmw_sem):
    """Full-manual fused pass: every operand is DMA'd; grid is trivial.

    The whole (padded) batch fits in VMEM (B×H + 3·B·128 floats), so each
    packed [rows, 128] table tile is visited once, its softmax·dloss
    recomputed once, and both gradients fall out of two dots:

        dt_tile  = Σ_k pd_kᵀ @ s_k   (s_k's zero lanes route each
                                      interleave into its own lane group)
        ds      += Σ_k lane_mask_k(pd_k @ tile)

    The onehot label term is NOT in the sweep (saves ~2 VPU passes over
    B x V): after the sweep, a b-iteration read-modify-write loop
    subtracts corr[i] = d_i·s_i from dt row arow[i] (ds gets its d·T[a]
    correction outside the kernel, sharing the forward's row gather).

    Unroll-by-2 with whole-buffer DMAs (see _sweep); nj must be even.
    With a bf16 compute dtype the pd operand of both dots is rounded to
    bf16 (f32 accumulation) — gradients then match a dense bf16-matmul
    backward, not the f32 one.
    """
    rows = vt // pack
    j_clean = n_valid // vt
    b = s_vm.shape[0]
    copies = [
        pltpu.make_async_copy(s_hbm, s_vm, insem.at[0]),
        pltpu.make_async_copy(z_hbm, z_vm, insem.at[1]),
        pltpu.make_async_copy(d_hbm, d_vm, insem.at[2]),
        pltpu.make_async_copy(corr_hbm, corr_vm, insem.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()
    acc[:] = jnp.zeros_like(acc)
    s_k = _s_shifted(s_vm[:].astype(cdt), s_vm.shape[1], pack)
    z = _narrow(z_vm[:])
    d = _narrow(d_vm[:])

    def get_in(buf, slot, jj):
        return pltpu.make_async_copy(
            t_hbm.at[pl.ds(jj * rows, rows), :], buf, tsem.at[slot]
        )

    def put_out(buf, slot, jj):
        return pltpu.make_async_copy(
            buf, dt_hbm.at[pl.ds(jj * rows, rows), :], osem.at[slot]
        )

    def grad_tile(jj, raw_tile, mask_nv: bool):
        tile = raw_tile.astype(cdt)
        out = None
        total = jnp.zeros_like(acc[:])
        for k in range(pack):
            pd = _pd_tile(n_valid, vt, pack, jj, k, s_k[k], tile, z, d,
                          mask_nv).astype(cdt)
            contrib = jax.lax.dot_general(
                pd, s_k[k], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = contrib if out is None else out + contrib
            ds_c = jax.lax.dot_general(
                pd, tile, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if pack > 1:
                ds_c = jnp.where(_lane_mask(k, h, ds_c.shape), ds_c, 0.0)
            total = total + ds_c
        acc[:] += total
        return out

    def grad_tile_pred(jj, raw_tile, obuf):
        @pl.when(jj < j_clean)
        def _():
            obuf[:] = grad_tile(jj, raw_tile, False)

        @pl.when(jj >= j_clean)
        def _():
            obuf[:] = grad_tile(jj, raw_tile, True)

    get_in(tbuf0, 0, 0).start()

    def body(jj2, _):
        j0 = 2 * jj2

        get_in(tbuf1, 1, j0 + 1).start()
        get_in(tbuf0, 0, j0).wait()

        @pl.when(j0 >= 2)
        def _():
            put_out(obuf0, 0, j0 - 2).wait()

        grad_tile_pred(j0, tbuf0[:], obuf0)
        put_out(obuf0, 0, j0).start()

        @pl.when(j0 + 2 < nj)
        def _():
            get_in(tbuf0, 0, j0 + 2).start()

        get_in(tbuf1, 1, j0 + 1).wait()

        @pl.when(j0 >= 2)
        def _():
            put_out(obuf1, 1, j0 - 1).wait()

        grad_tile_pred(j0 + 1, tbuf1[:], obuf1)
        put_out(obuf1, 1, j0 + 1).start()
        return 0

    jax.lax.fori_loop(0, nj // 2, body, 0)
    put_out(obuf0, 0, nj - 2).wait()  # drain in-flight output DMAs
    put_out(obuf1, 1, nj - 1).wait()

    # onehot correction: dt[arow[i]] -= corr[i], sequentially (duplicate
    # answers must accumulate). ~b latency-bound [1, lanes] RMWs — far
    # cheaper than the 2 compare/sub passes over B x V they replace.
    def rmw(i, _):
        r = arow_ref[i]

        @pl.when(r >= 0)
        def _():
            get = pltpu.make_async_copy(
                dt_hbm.at[pl.ds(r, 1), :], rmw_buf, rmw_sem.at[0]
            )
            get.start()
            get.wait()
            rmw_buf[:] = rmw_buf[:] - corr_vm[pl.ds(i, 1), :]
            put = pltpu.make_async_copy(
                rmw_buf, dt_hbm.at[pl.ds(r, 1), :], rmw_sem.at[0]
            )
            put.start()
            put.wait()

        return 0

    jax.lax.fori_loop(0, b, rmw, 0)

    folded = acc[:]
    if pack > 1:
        # sum the pack lane-groups into a [b, h] gradient via a constant
        # fold matrix F[k*h + c, c] = 1 (reshapes don't lower in Mosaic)
        lanes = folded.shape[1]
        fold = (
            jax.lax.broadcasted_iota(jnp.int32, (lanes, h), 0) % h
            == jax.lax.broadcasted_iota(jnp.int32, (lanes, h), 1)
        ).astype(jnp.float32)
        folded = jnp.dot(folded, fold, preferred_element_type=jnp.float32)
    ds_ref[:] = folded[:, :h]


def _run_bwd(states, table2, a128, logz, dloss, n_valid, bt, vt, h, pack, cdt,
             interpret):
    b = states.shape[0]
    lanes = table2.shape[1]  # = h * pack
    rows_total = table2.shape[0]
    nj = rows_total // (vt // pack)
    z128 = _wide(logz)
    d128 = _wide(dloss, jnp.float32)

    # onehot corrections, built once outside the sweep:
    #   dt[a_i] -= d_i·s_i  (corr rows, RMW'd in-kernel after the sweep)
    #   ds_i    -= d_i·T[a_i]  (applied below, reusing the row gather)
    a = _narrow(a128)[:, 0]
    arow = jnp.where(a >= 0, a // pack, -1).astype(jnp.int32)
    s32 = states.astype(jnp.float32)
    tiled_s = jnp.tile(s32, (1, pack)) if pack > 1 else s32
    if pack > 1:
        win = jnp.arange(lanes)[None, :] // h == (jnp.clip(a, 0, None) % pack)[:, None]
        placed = jnp.where(win, tiled_s, 0.0)
    else:
        placed = tiled_s
    corr = placed * dloss.astype(jnp.float32)[:, None]

    dstates, dtable2 = pl.pallas_call(
        functools.partial(_grads_kernel, n_valid, vt, nj, h, pack, cdt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((vt // pack, lanes), table2.dtype),
            pltpu.VMEM((vt // pack, lanes), table2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((vt // pack, lanes), jnp.float32),
            pltpu.VMEM((vt // pack, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((b, states.shape[1]), states.dtype),
            pltpu.VMEM((b, LANES), jnp.float32),
            pltpu.VMEM((b, LANES), jnp.float32),
            pltpu.VMEM((b, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((b, max(lanes, LANES)), jnp.float32),
            pltpu.VMEM((1, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((b, h), jnp.float32),
            jax.ShapeDtypeStruct((rows_total, lanes), jnp.float32),
        ),
        interpret=interpret,
    )(arow, states, z128, d128, corr, table2)

    gold_row = _gold_rows(table2, a, h, pack, interpret)
    ds_corr = gold_row * dloss.astype(jnp.float32)[:, None]
    dstates = dstates - jnp.where((a >= 0)[:, None], ds_corr, 0.0)
    return dstates, dtable2


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def streaming_softmax_ce(
    states: jnp.ndarray,  # [B, H] f32
    table: jnp.ndarray,  # [V, H] f32 (tied item-embedding table)
    answers: jnp.ndarray,  # [B] int32 gold item ids
    n_valid: int | None = None,  # logits over cols >= n_valid are -inf
    block_b: int = 256,
    block_v: int = 4096,
    interpret: bool | None = None,  # None: interpret off-TPU (CPU tests)
    dtype: str | None = None,  # tile-matmul compute dtype (None: as given)
) -> jnp.ndarray:
    """Per-example CE over the full catalog without materializing [B, V].

    Matches `logsumexp(states @ table.T) - logits[answers]` exactly at
    f32 (same semantics as the reference's CrossEntropyLoss path,
    `src/model/bsarec.py:33-35`). H must divide 128 or be a multiple
    of 128.

    `dtype="bfloat16"` rounds the tile/state matmul operands to bf16
    in-kernel (f32 accumulation everywhere): the forward then equals a
    dense `einsum(s.bf16, t.bf16, preferred=f32)` softmax-CE and the
    MXU runs at its bf16 rate; max/exp/sum/logZ and both gradients
    still accumulate in f32 (the bf16 policy, `core` docs).
    """
    loss, _ = _fwd_rule(states, table, answers, n_valid, block_b, block_v,
                        interpret, dtype)
    return loss


def _resolve_interpret(interpret):
    return jax.default_backend() != "tpu" if interpret is None else interpret


def _prep(states, table, answers, n_valid, block_b, block_v, dtype=None):
    b, h = states.shape
    v = table.shape[0]
    n_valid = v if n_valid is None else n_valid
    cdt = jnp.dtype(dtype) if dtype is not None else table.dtype
    if h < LANES:
        assert LANES % h == 0, f"H={h} must divide {LANES}"
        pack = LANES // h
    else:
        assert h % LANES == 0, f"H={h} must be a multiple of {LANES}"
        pack = 1
    bt = min(block_b, max(8, b))
    # VMEM budget: the fused backward holds 2 table buffers (table dtype)
    # + 2 f32 gradient buffers of [vt/pack, h*pack]; cap the tile so the
    # four stay under ~8 MB (matters for h >= 128, e.g. d=256 catalogs)
    per_col = h * (2 * jnp.dtype(table.dtype).itemsize + 2 * 4)
    vt_cap = max(2 * pack * 8, (8 << 20) // per_col)
    vt = max(2 * pack * 8, min(block_v, v, vt_cap))
    if vt >= 2 * pack * 8:
        # floor to a power of two (>= 16, so always a multiple of
        # pack*8): odd tile widths misalign vp and force a full-table
        # pad COPY below — at 10M x 256 that is a 5-10 GB copy PER CALL
        vt = 1 << (vt.bit_length() - 1)
    vt = max(2 * pack * 8, pl.cdiv(vt, pack * 8) * pack * 8)
    # pad the catalog so nj = Vp / vt is even, then view as packed rows
    vp = pl.cdiv(v, 2 * vt) * 2 * vt
    tp = _pad_to(table, vp, 0)
    table2 = tp.reshape(vp // pack, h * pack)  # row-major: free relayout
    sp = _pad_to(states, pl.cdiv(b, bt) * bt, 0)
    # padded batch rows get answer -1: hits nothing, gold stays 0.
    # Out-of-range answers (another shard's gold, or ids >= n_valid) map
    # to -1 too: the gold gather clips its index, so when the catalog is
    # exactly tile-aligned (vp == v) a stray positive id would otherwise
    # land on a REAL row and produce a silently wrong nonzero gold.
    a32 = answers.astype(jnp.int32)
    a32 = jnp.where((a32 >= 0) & (a32 < n_valid), a32, -1)
    ap = _pad_to(a32, sp.shape[0], 0, value=-1)
    return sp, table2, _wide(ap), n_valid, bt, vt, h, pack, cdt, b, v


def _fwd_rule(states, table, answers, n_valid, block_b, block_v, interpret,
              dtype=None):
    interpret = _resolve_interpret(interpret)
    sp, t2, a128, nva, bt, vt, h, pack, cdt, b, v = _prep(
        states, table, answers, n_valid, block_b, block_v, dtype
    )
    loss, logz = _run_fwd(sp, t2, a128, nva, bt, vt, h, pack, cdt, interpret)
    return loss[:b], (states, table, answers, logz)


# ---- building blocks for the vocab-sharded (shard_map) composition ------
# Each model-axis shard sweeps only its own table rows; the shard-local
# (loss, logZ) pair is enough to assemble the global softmax:
#   logZ_global = logsumexp_shards(logZ_local)
#   gold        = Σ_shards (logZ_local − loss_local)   (0 off-shard)
# and the backward reuses the standard kernels with the *global* logZ.
# See `parallel/logits.py:sharded_streaming_ce`.


def streaming_ce_stats(states, table, answers, n_valid=None, block_b: int = 256,
                       block_v: int = 4096, interpret: bool | None = None,
                       dtype: str | None = None):
    """Per-row (loss_local, logz_local) over THIS table's rows only.

    Not differentiable — a building block for cross-shard combination.
    `answers` may contain out-of-range ids (another shard's gold): they
    simply never match, so gold contributes 0 to loss_local.
    """
    interpret = _resolve_interpret(interpret)
    sp, t2, a128, nva, bt, vt, h, pack, cdt, b, v = _prep(
        states, table, answers, n_valid, block_b, block_v, dtype
    )
    loss, logz = _run_fwd(sp, t2, a128, nva, bt, vt, h, pack, cdt, interpret)
    return loss[:b], logz[:b]


def streaming_ce_grads(states, table, answers, logz, dloss, n_valid=None,
                       block_b: int = 256, block_v: int = 4096,
                       interpret: bool | None = None,
                       dtype: str | None = None):
    """(dstates_partial, dtable) for this shard given the GLOBAL per-row
    logZ. dstates_partial sums only this shard's softmax columns — psum
    it over the model axis; dtable covers exactly this shard's rows —
    psum it over the data axis."""
    interpret = _resolve_interpret(interpret)
    sp, t2, a128, nva, bt, vt, h, pack, cdt, b, v = _prep(
        states, table, answers, n_valid, block_b, block_v, dtype
    )
    zp = _pad_to(logz, sp.shape[0], 0)
    dp = _pad_to(dloss, sp.shape[0], 0)  # padded rows: dloss 0 -> no grad
    dstates, dtable2 = _run_bwd(
        sp, t2, a128, zp, dp, nva, bt, vt, h, pack, cdt, interpret
    )
    return dstates[:b], dtable2.reshape(-1, h)[:v]


def _bwd_rule(n_valid, block_b, block_v, interpret, dtype, res, dloss):
    interpret = _resolve_interpret(interpret)
    states, table, answers, logz = res
    sp, t2, a128, nva, bt, vt, h, pack, cdt, b, v = _prep(
        states, table, answers, n_valid, block_b, block_v, dtype
    )
    zp = logz  # computed on the padded batch, already padded length
    dp = _pad_to(dloss, sp.shape[0], 0)  # padded rows: dloss 0 -> no grad
    dstates, dtable2 = _run_bwd(
        sp, t2, a128, zp, dp, nva, bt, vt, h, pack, cdt, interpret
    )
    dtable = dtable2.reshape(-1, h)[:v]
    return dstates[:b], dtable.astype(table.dtype), None


streaming_softmax_ce.defvjp(_fwd_rule, _bwd_rule)
