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
   VMEM scratches inside an unroll-by-2 `fori_loop`. Measured on v5e
   (1M x 64 f32 catalog, B=256): 3.5 ms forward, 9.4 ms fwd+bwd — the
   sweeps are VPU-pass-bound (~10 elementwise passes over B x V at
   ~1e12 elem/s), roughly 4x above the pure HBM-read bound.

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
    zero = jnp.zeros((bt, h), jnp.float32)
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
# forward: per-row (loss, logZ) in one streaming sweep
# --------------------------------------------------------------------------


def _fwd_kernel(n_valid, vt, nj, h, pack, s_ref, a_ref, t_hbm, loss_ref, z_ref,
                tbuf0, tbuf1, sem, m_sc, s_sc, g_sc):
    bt = s_ref.shape[0]
    rows = vt // pack
    m_sc[:] = jnp.full_like(m_sc, NEG_INF)
    s_sc[:] = jnp.zeros_like(s_sc)
    g_sc[:] = jnp.zeros_like(g_sc)
    s_k = _s_shifted(s_ref[:], h, pack)
    a = _narrow(a_ref[:])

    def step(j, tile):
        m_old = _narrow(m_sc[:])
        m_new = m_old
        parts = []
        for k in range(pack):
            logits = jax.lax.dot_general(
                s_k[k], tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cols = (
                j * vt
                + pack * jax.lax.broadcasted_iota(jnp.int32, (bt, rows), 1)
                + k
            )
            logits = jnp.where(cols < n_valid, logits, NEG_INF)
            parts.append((logits, cols))
            m_new = jnp.maximum(m_new, jnp.max(logits, axis=-1, keepdims=True))
        scale = jnp.exp(m_old - m_new)  # exp(-inf - m) = 0 on the first tile
        s_new = _narrow(s_sc[:]) * scale
        g_new = _narrow(g_sc[:])
        for logits, cols in parts:
            s_new = s_new + jnp.sum(jnp.exp(logits - m_new), axis=-1, keepdims=True)
            g_new = g_new + jnp.sum(
                jnp.where(cols == a, logits, 0.0), axis=-1, keepdims=True
            )
        m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)
        s_sc[:] = jnp.broadcast_to(s_new, s_sc.shape)
        g_sc[:] = jnp.broadcast_to(g_new, g_sc.shape)

    _sweep(t_hbm, tbuf0, tbuf1, sem, nj, rows, step)
    logz = jnp.log(_narrow(s_sc[:])) + _narrow(m_sc[:])
    loss_ref[:] = jnp.broadcast_to(logz - _narrow(g_sc[:]), loss_ref.shape)
    z_ref[:] = jnp.broadcast_to(logz, z_ref.shape)


def _run_fwd(states, table2, a128, n_valid, bt, vt, h, pack, interpret):
    b = states.shape[0]
    lanes = table2.shape[1]  # = h * pack
    nj = table2.shape[0] // (vt // pack)
    wide = pl.BlockSpec((bt, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    loss, logz = pl.pallas_call(
        functools.partial(_fwd_kernel, n_valid, vt, nj, h, pack),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            wide,
            pl.BlockSpec(memory_space=pltpu.HBM),  # packed table stays in HBM
        ],
        out_specs=(wide, wide),
        scratch_shapes=[
            pltpu.VMEM((vt // pack, lanes), jnp.float32),
            pltpu.VMEM((vt // pack, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((bt, LANES), jnp.float32),
            pltpu.VMEM((bt, LANES), jnp.float32),
            pltpu.VMEM((bt, LANES), jnp.float32),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((b, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, LANES), jnp.float32),
        ),
        interpret=interpret,
    )(states, a128, table2)
    return loss[:, 0], logz[:, 0]


# --------------------------------------------------------------------------
# backward: two streaming sweeps recomputing tile logits
# --------------------------------------------------------------------------


def _p_tile(n_valid, vt, pack, j, k, s_k, tile, a, z):
    """Tile softmax-minus-onehot for interleave k: [bt, vt // pack]."""
    bt = s_k.shape[0]
    rows = vt // pack
    logits = jax.lax.dot_general(
        s_k, tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    cols = j * vt + pack * jax.lax.broadcasted_iota(jnp.int32, (bt, rows), 1) + k
    p = jnp.where(cols < n_valid, jnp.exp(logits - z), 0.0)
    return p - (cols == a).astype(jnp.float32)


def _dstates_kernel(n_valid, vt, nj, h, pack, s_ref, a_ref, z_ref, d_ref, t_hbm,
                    ds_ref, tbuf0, tbuf1, sem, acc):
    rows = vt // pack
    acc[:] = jnp.zeros_like(acc)
    s_k = _s_shifted(s_ref[:], h, pack)
    a = _narrow(a_ref[:])
    z = _narrow(z_ref[:])

    def step(j, tile):
        # (p_k @ tile) lanes [k*h, (k+1)*h) hold Σ_r p_k[b,r]·T[pack·r+k];
        # other lanes mix wrong rows and are masked off.
        total = jnp.zeros_like(acc[:])
        for k in range(pack):
            p = _p_tile(n_valid, vt, pack, j, k, s_k[k], tile, a, z)
            contrib = jnp.dot(p, tile, preferred_element_type=jnp.float32)
            if pack > 1:
                contrib = jnp.where(_lane_mask(k, h, contrib.shape), contrib, 0.0)
            total = total + contrib
        acc[:] += total

    _sweep(t_hbm, tbuf0, tbuf1, sem, nj, rows, step)
    folded = acc[:]
    if pack > 1:
        # sum the pack lane-groups into a [bt, h] gradient via a constant
        # fold matrix F[k*h + c, c] = 1 (reshapes don't lower in Mosaic)
        lanes = folded.shape[1]
        fold = (
            jax.lax.broadcasted_iota(jnp.int32, (lanes, h), 0) % h
            == jax.lax.broadcasted_iota(jnp.int32, (lanes, h), 1)
        ).astype(jnp.float32)
        folded = jnp.dot(folded, fold, preferred_element_type=jnp.float32)
    ds_ref[:] = folded * _narrow(d_ref[:])


def _dtable_kernel(n_valid, vt, nj, h, pack, s_hbm, a_hbm, z_hbm, d_hbm, t_hbm,
                   dt_hbm, tbuf0, tbuf1, tsem, obuf0, obuf1, osem, s_vm, a_vm,
                   z_vm, d_vm, insem):
    """Full-manual pass: every operand is DMA'd; grid is trivial.

    The whole (padded) batch fits in VMEM (B×H + 3·B·128 floats), so
    each packed [rows, 128] gradient tile accumulates over the full
    batch: dt_tile = Σ_k p_kᵀ @ s_k (s_k's zero lanes route each
    interleave's gradient into its own lane group). Unroll-by-2 with
    whole-buffer DMAs (see _sweep); nj must be even.
    """
    rows = vt // pack
    copies = [
        pltpu.make_async_copy(s_hbm, s_vm, insem.at[0]),
        pltpu.make_async_copy(a_hbm, a_vm, insem.at[1]),
        pltpu.make_async_copy(z_hbm, z_vm, insem.at[2]),
        pltpu.make_async_copy(d_hbm, d_vm, insem.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()
    s_k = _s_shifted(s_vm[:], s_vm.shape[1], pack)
    a = _narrow(a_vm[:])
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

    def grad_tile(jj, tile):
        out = None
        for k in range(pack):
            p = _p_tile(n_valid, vt, pack, jj, k, s_k[k], tile, a, z) * d
            contrib = jax.lax.dot_general(
                p, s_k[k], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = contrib if out is None else out + contrib
        return out

    get_in(tbuf0, 0, 0).start()

    def body(jj2, _):
        j0 = 2 * jj2

        get_in(tbuf1, 1, j0 + 1).start()
        get_in(tbuf0, 0, j0).wait()

        @pl.when(j0 >= 2)
        def _():
            put_out(obuf0, 0, j0 - 2).wait()

        obuf0[:] = grad_tile(j0, tbuf0[:])
        put_out(obuf0, 0, j0).start()

        @pl.when(j0 + 2 < nj)
        def _():
            get_in(tbuf0, 0, j0 + 2).start()

        get_in(tbuf1, 1, j0 + 1).wait()

        @pl.when(j0 >= 2)
        def _():
            put_out(obuf1, 1, j0 - 1).wait()

        obuf1[:] = grad_tile(j0 + 1, tbuf1[:])
        put_out(obuf1, 1, j0 + 1).start()
        return 0

    jax.lax.fori_loop(0, nj // 2, body, 0)
    put_out(obuf0, 0, nj - 2).wait()  # drain in-flight output DMAs
    put_out(obuf1, 1, nj - 1).wait()


def _run_bwd(states, table2, a128, logz, dloss, n_valid, bt, vt, h, pack, interpret):
    b = states.shape[0]
    lanes = table2.shape[1]  # = h * pack
    rows_total = table2.shape[0]
    nj = rows_total // (vt // pack)
    z128 = _wide(logz)
    d128 = _wide(dloss, jnp.float32)
    wide = pl.BlockSpec((bt, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

    dstates = pl.pallas_call(
        functools.partial(_dstates_kernel, n_valid, vt, nj, h, pack),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            wide,
            wide,
            wide,
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((bt, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((vt // pack, lanes), jnp.float32),
            pltpu.VMEM((vt // pack, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((bt, lanes), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((b, h), jnp.float32),
        interpret=interpret,
    )(states, a128, z128, d128, table2)

    dtable2 = pl.pallas_call(
        functools.partial(_dtable_kernel, n_valid, vt, nj, h, pack),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((vt // pack, lanes), jnp.float32),
            pltpu.VMEM((vt // pack, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((vt // pack, lanes), jnp.float32),
            pltpu.VMEM((vt // pack, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((states.shape[0], states.shape[1]), jnp.float32),
            pltpu.VMEM((states.shape[0], LANES), jnp.int32),
            pltpu.VMEM((states.shape[0], LANES), jnp.float32),
            pltpu.VMEM((states.shape[0], LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        out_shape=jax.ShapeDtypeStruct((rows_total, lanes), jnp.float32),
        interpret=interpret,
    )(states, a128, z128, d128, table2)
    return dstates, dtable2


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def streaming_softmax_ce(
    states: jnp.ndarray,  # [B, H] f32
    table: jnp.ndarray,  # [V, H] f32 (tied item-embedding table)
    answers: jnp.ndarray,  # [B] int32 gold item ids
    n_valid: int | None = None,  # logits over cols >= n_valid are -inf
    block_b: int = 256,
    block_v: int = 4096,
    interpret: bool | None = None,  # None: interpret off-TPU (CPU tests)
) -> jnp.ndarray:
    """Per-example CE over the full catalog without materializing [B, V].

    Matches `logsumexp(states @ table.T) - logits[answers]` exactly at
    f32 (same semantics as the reference's CrossEntropyLoss path,
    `src/model/bsarec.py:33-35`). H must divide 128 or be a multiple
    of 128.
    """
    loss, _ = _fwd_rule(states, table, answers, n_valid, block_b, block_v, interpret)
    return loss


def _resolve_interpret(interpret):
    return jax.default_backend() != "tpu" if interpret is None else interpret


def _prep(states, table, answers, n_valid, block_b, block_v):
    b, h = states.shape
    v = table.shape[0]
    n_valid = v if n_valid is None else n_valid
    if h < LANES:
        assert LANES % h == 0, f"H={h} must divide {LANES}"
        pack = LANES // h
    else:
        assert h % LANES == 0, f"H={h} must be a multiple of {LANES}"
        pack = 1
    bt = min(block_b, max(8, b))
    vt = max(2 * pack * 8, min(block_v, v))
    vt = pl.cdiv(vt, pack * 8) * pack * 8
    # pad the catalog so nj = Vp / vt is even, then view as packed rows
    vp = pl.cdiv(v, 2 * vt) * 2 * vt
    tp = _pad_to(table, vp, 0)
    table2 = tp.reshape(vp // pack, h * pack)  # row-major: free relayout
    sp = _pad_to(states, pl.cdiv(b, bt) * bt, 0)
    # padded batch rows get answer -1: hits nothing, gold stays 0
    ap = _pad_to(answers.astype(jnp.int32), sp.shape[0], 0, value=-1)
    return sp, table2, _wide(ap), n_valid, bt, vt, h, pack, b, v


def _fwd_rule(states, table, answers, n_valid, block_b, block_v, interpret):
    interpret = _resolve_interpret(interpret)
    sp, t2, a128, nva, bt, vt, h, pack, b, v = _prep(
        states, table, answers, n_valid, block_b, block_v
    )
    loss, logz = _run_fwd(sp, t2, a128, nva, bt, vt, h, pack, interpret)
    return loss[:b], (states, table, answers, logz)


# ---- building blocks for the vocab-sharded (shard_map) composition ------
# Each model-axis shard sweeps only its own table rows; the shard-local
# (loss, logZ) pair is enough to assemble the global softmax:
#   logZ_global = logsumexp_shards(logZ_local)
#   gold        = Σ_shards (logZ_local − loss_local)   (0 off-shard)
# and the backward reuses the standard kernels with the *global* logZ.
# See `parallel/logits.py:sharded_streaming_ce`.


def streaming_ce_stats(states, table, answers, n_valid=None, block_b: int = 256,
                       block_v: int = 4096, interpret: bool | None = None):
    """Per-row (loss_local, logz_local) over THIS table's rows only.

    Not differentiable — a building block for cross-shard combination.
    `answers` may contain out-of-range ids (another shard's gold): they
    simply never match, so gold contributes 0 to loss_local.
    """
    interpret = _resolve_interpret(interpret)
    sp, t2, a128, nva, bt, vt, h, pack, b, v = _prep(
        states, table, answers, n_valid, block_b, block_v
    )
    loss, logz = _run_fwd(sp, t2, a128, nva, bt, vt, h, pack, interpret)
    return loss[:b], logz[:b]


def streaming_ce_grads(states, table, answers, logz, dloss, n_valid=None,
                       block_b: int = 256, block_v: int = 4096,
                       interpret: bool | None = None):
    """(dstates_partial, dtable) for this shard given the GLOBAL per-row
    logZ. dstates_partial sums only this shard's softmax columns — psum
    it over the model axis; dtable covers exactly this shard's rows —
    psum it over the data axis."""
    interpret = _resolve_interpret(interpret)
    sp, t2, a128, nva, bt, vt, h, pack, b, v = _prep(
        states, table, answers, n_valid, block_b, block_v
    )
    zp = _pad_to(logz, sp.shape[0], 0)
    dp = _pad_to(dloss, sp.shape[0], 0)  # padded rows: dloss 0 -> no grad
    dstates, dtable2 = _run_bwd(sp, t2, a128, zp, dp, nva, bt, vt, h, pack, interpret)
    return dstates[:b], dtable2.reshape(-1, h)[:v]


def _bwd_rule(n_valid, block_b, block_v, interpret, res, dloss):
    interpret = _resolve_interpret(interpret)
    states, table, answers, logz = res
    sp, t2, a128, nva, bt, vt, h, pack, b, v = _prep(
        states, table, answers, n_valid, block_b, block_v
    )
    zp = logz  # computed on the padded batch, already padded length
    dp = _pad_to(dloss, sp.shape[0], 0)  # padded rows: dloss 0 -> no grad
    dstates, dtable2 = _run_bwd(sp, t2, a128, zp, dp, nva, bt, vt, h, pack, interpret)
    dtable = dtable2.reshape(-1, h)[:v]
    return dstates[:b], dtable, None


streaming_softmax_ce.defvjp(_fwd_rule, _bwd_rule)
