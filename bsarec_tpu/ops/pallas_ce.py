"""Streaming full-vocabulary softmax cross-entropy (Pallas TPU kernel).

The reference computes full-vocab CE by materializing the [B, V] logit
matrix (`src/model/bsarec.py:33-35`, `torch.nn.CrossEntropyLoss`). XLA
does the same: forward keeps [B, V] logits alive for the backward, so
HBM traffic and peak memory scale with B·V — prohibitive for the
10M-item production catalogs this framework targets (256 × 10M × 4 B
≈ 10 GB per step).

This kernel streams the vocabulary through VMEM in [Vt, H] tiles and
keeps only O(B) running statistics (online-softmax max/sum rescaling,
à la flash attention), so memory is O(B + Vt·H) and the item table is
read exactly once per pass. The custom VJP recomputes tile logits in
the backward (FLOPs are nearly free on the MXU at these shapes; HBM
bandwidth is the scarce resource) and emits

    d_states = (softmax(logits) − onehot(answers)) @ table
    d_table  = (softmax(logits) − onehot(answers))ᵀ @ states

with two more streaming passes. Numerics match the dense path at f32.

Grid layout: (B tiles outer, V tiles inner) so the running stats for a
batch tile live in VMEM scratch across the whole vocab sweep; outputs
are written on the final vocab tile. The d_table pass flips the grid
(V outer, B inner) so each table-gradient tile is revisited
consecutively and accumulates in place.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _pad_to(x: jnp.ndarray, size: int, axis: int, value=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _col_ids(j, bt: int, vt: int):
    return j * vt + jax.lax.broadcasted_iota(jnp.int32, (bt, vt), 1)


# --------------------------------------------------------------------------
# forward: per-row loss + logZ
# --------------------------------------------------------------------------


def _fwd_kernel(n_valid_ref, s_ref, t_ref, a_ref, loss_ref, logz_ref, m_sc, s_sc, g_sc):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    bt = s_ref.shape[0]
    vt = t_ref.shape[0]

    @pl.when(j == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        s_sc[:] = jnp.zeros_like(s_sc)
        g_sc[:] = jnp.zeros_like(g_sc)

    logits = jax.lax.dot_general(
        s_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cols = _col_ids(j, bt, vt)
    logits = jnp.where(cols < n_valid_ref[0], logits, NEG_INF)

    m_old = m_sc[:, 0:1]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=-1, keepdims=True))
    scale = jnp.exp(m_old - m_new)  # exp(-inf - m) = 0 handles first tile
    s_new = s_sc[:, 0:1] * scale + jnp.sum(
        jnp.exp(logits - m_new), axis=-1, keepdims=True
    )
    hit = cols == a_ref[:]  # a_ref block is [bt, 1] -> broadcasts
    g_new = g_sc[:, 0:1] + jnp.sum(jnp.where(hit, logits, 0.0), axis=-1, keepdims=True)

    m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)
    s_sc[:] = jnp.broadcast_to(s_new, s_sc.shape)
    g_sc[:] = jnp.broadcast_to(g_new, g_sc.shape)

    @pl.when(j == nj - 1)
    def _():
        logz = jnp.log(s_sc[:, 0:1]) + m_sc[:, 0:1]
        loss_ref[:] = jnp.broadcast_to(logz - g_sc[:, 0:1], loss_ref.shape)
        logz_ref[:] = jnp.broadcast_to(logz, logz_ref.shape)


def _run_fwd(states, table, answers, n_valid, bt, vt, interpret):
    b, h = states.shape
    v = table.shape[0]
    grid = (pl.cdiv(b, bt), pl.cdiv(v, vt))
    loss, logz = pl.pallas_call(
        _fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bt, h), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((vt, h), lambda i, j, *_: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((bt, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((bt, 128), jnp.float32),
                pltpu.VMEM((bt, 128), jnp.float32),
                pltpu.VMEM((bt, 128), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ),
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32), states, table, answers[:, None])
    return loss[:, 0], logz[:, 0]


# --------------------------------------------------------------------------
# backward: d_states (B outer) and d_table (V outer), recomputing logits
# --------------------------------------------------------------------------


def _dstates_kernel(n_valid_ref, s_ref, t_ref, a_ref, z_ref, d_ref, ds_ref, acc):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    bt = s_ref.shape[0]
    vt = t_ref.shape[0]

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    logits = jax.lax.dot_general(
        s_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cols = _col_ids(j, bt, vt)
    p = jnp.where(cols < n_valid_ref[0], jnp.exp(logits - z_ref[:]), 0.0)
    p = p - (cols == a_ref[:]).astype(jnp.float32)
    acc[:] += jnp.dot(p, t_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        ds_ref[:] = acc[:] * d_ref[:]


def _dtable_kernel(n_valid_ref, s_ref, t_ref, a_ref, z_ref, d_ref, dt_ref):
    i = pl.program_id(1)  # batch tile (inner)
    bt = s_ref.shape[0]
    vt = t_ref.shape[0]

    @pl.when(i == 0)
    def _():
        dt_ref[:] = jnp.zeros_like(dt_ref)

    logits = jax.lax.dot_general(
        s_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cols = _col_ids(pl.program_id(0), bt, vt)
    p = jnp.where(cols < n_valid_ref[0], jnp.exp(logits - z_ref[:]), 0.0)
    p = p - (cols == a_ref[:]).astype(jnp.float32)
    p = p * d_ref[:]
    dt_ref[:] += jax.lax.dot_general(
        p, s_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _run_bwd(states, table, answers, logz, dloss, n_valid, bt, vt, interpret):
    b, h = states.shape
    v = table.shape[0]
    nb, nv = pl.cdiv(b, bt), pl.cdiv(v, vt)
    nva = jnp.asarray([n_valid], jnp.int32)
    a2 = answers[:, None]
    z2 = logz[:, None]
    d2 = dloss[:, None].astype(jnp.float32)

    dstates = pl.pallas_call(
        _dstates_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, nv),
            in_specs=[
                pl.BlockSpec((bt, h), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((vt, h), lambda i, j, *_: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bt, h), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((bt, h), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h), jnp.float32),
        interpret=interpret,
    )(nva, states, table, a2, z2, d2)

    dtable = pl.pallas_call(
        _dtable_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nv, nb),
            in_specs=[
                pl.BlockSpec((bt, h), lambda j, i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((vt, h), lambda j, i, *_: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda j, i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda j, i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1), lambda j, i, *_: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (vt, h), lambda j, i, *_: (j, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((v, h), jnp.float32),
        interpret=interpret,
    )(nva, states, table, a2, z2, d2)
    return dstates, dtable


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
    block_v: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-example CE over the full catalog without materializing [B, V].

    Matches `logsumexp(states @ table.T) - logits[answers]` exactly at
    f32 (same semantics as the reference's CrossEntropyLoss path,
    `src/model/bsarec.py:33-35`).
    """
    loss, _ = _fwd_rule(states, table, answers, n_valid, block_b, block_v, interpret)
    return loss


def _prep(states, table, answers, n_valid, block_b, block_v):
    b, h = states.shape
    v = table.shape[0]
    n_valid = v if n_valid is None else n_valid
    bt = min(block_b, max(8, b))
    vt = min(block_v, max(128, v))
    sp = _pad_to(states, pl.cdiv(b, bt) * bt, 0)
    tp = _pad_to(table, pl.cdiv(v, vt) * vt, 0)
    ap = _pad_to(answers.astype(jnp.int32), sp.shape[0], 0)
    return sp, tp, ap, n_valid, bt, vt, b, v


def _fwd_rule(states, table, answers, n_valid, block_b, block_v, interpret):
    sp, tp, ap, nva, bt, vt, b, v = _prep(
        states, table, answers, n_valid, block_b, block_v
    )
    loss, logz = _run_fwd(sp, tp, ap, nva, bt, vt, interpret)
    return loss[:b], (states, table, answers, logz)


def _bwd_rule(n_valid, block_b, block_v, interpret, res, dloss):
    states, table, answers, logz = res
    sp, tp, ap, nva, bt, vt, b, v = _prep(
        states, table, answers, n_valid, block_b, block_v
    )
    zp = _pad_to(logz, sp.shape[0], 0)
    dp = _pad_to(dloss, sp.shape[0], 0)  # padded rows: dloss 0 -> no grad
    dstates, dtable = _run_bwd(sp, tp, ap, zp, dp, nva, bt, vt, interpret)
    return dstates[:b], dtable[:v], None


streaming_softmax_ce.defvjp(_fwd_rule, _bwd_rule)
