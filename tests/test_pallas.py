"""Pallas streaming kernels vs dense references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsarec_tpu.ops.pallas_ce import streaming_softmax_ce
from bsarec_tpu.ops.pallas_rank import build_seen_bitmask, streaming_masked_topk


def _dense_ce(states, table, answers, n_valid):
    logits = states @ table.T
    logits = jnp.where(jnp.arange(table.shape[0])[None, :] < n_valid, logits, -jnp.inf)
    return jax.nn.logsumexp(logits, axis=-1) - jnp.take_along_axis(
        logits, answers[:, None], axis=-1
    )[:, 0]


@pytest.mark.parametrize("b,v,h,n_valid", [(8, 256, 64, 256), (13, 300, 32, 290)])
def test_streaming_ce_matches_dense(b, v, h, n_valid):
    rng = np.random.default_rng(0)
    states = jnp.asarray(rng.normal(size=(b, h)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    answers = jnp.asarray(rng.integers(1, n_valid, size=b).astype(np.int32))

    got = streaming_softmax_ce(
        states, table, answers, n_valid, 8, 128, True
    )
    want = _dense_ce(states, table, answers, n_valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_streaming_ce_grads_match_dense():
    rng = np.random.default_rng(1)
    b, v, h, n_valid = 8, 256, 32, 250
    states = jnp.asarray(rng.normal(size=(b, h)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    answers = jnp.asarray(rng.integers(1, n_valid, size=b).astype(np.int32))

    def stream_loss(s, t):
        return jnp.mean(
            streaming_softmax_ce(s, t, answers, n_valid, 8, 128, True)
        )

    def dense_loss(s, t):
        return jnp.mean(_dense_ce(s, t, answers, n_valid))

    gs1, gt1 = jax.grad(stream_loss, argnums=(0, 1))(states, table)
    gs2, gt2 = jax.grad(dense_loss, argnums=(0, 1))(states, table)
    np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt2), rtol=1e-4, atol=1e-5)


def test_seen_bitmask():
    """Bit-plane layout: item v -> word (v % 4096) % 128, bit (v % 4096) // 128."""
    seen = np.array([[1, 129, 0, 0], [2, 2, 4097, 131]], np.int32)
    bm = build_seen_bitmask(seen, 8192)
    assert bm.shape == (2, 8192 // 32)
    u = bm.view(np.uint32)
    assert u[0, 0] == 1  # padding item always set
    assert u[0, 1] == (1 << 0) | (1 << 1)  # items 1 (bit 0) and 129 (bit 1)
    assert u[1, 2] == 1 << 0  # item 2
    assert u[1, 3] == 1 << 1  # item 131 -> word 3, bit 1
    assert u[1, 128 + 1] == 1 << 0  # item 4097 -> tile 1, word 128+1, bit 0


def test_seen_ids_to_bitmask_matches_host_builder():
    """Device per-batch builder (huge-catalog eval path) reproduces the
    host bitmask bit-for-bit: duplicates, padding rows, empty rows,
    multi-tile ids, and a non-tile-aligned vocab tail."""
    from bsarec_tpu.ops.pallas_rank import dedupe_seen_rows, seen_ids_to_bitmask

    rng = np.random.default_rng(0)
    v = 5000  # 2 tiles with a padded tail
    ids = rng.integers(0, v, size=(7, 33)).astype(np.int32)
    ids[:, -5:] = 0
    ids[2] = 0  # user with no history
    ids[3, :4] = [7, 7, 7, 4097]  # duplicates + second tile
    deduped = dedupe_seen_rows(ids)
    # dedupe keeps the id set (minus repeats) and only ever zeroes slots
    for r in range(ids.shape[0]):
        assert set(deduped[r]) - {0} == set(ids[r]) - {0}
    host = build_seen_bitmask(ids, v)
    dev = np.asarray(seen_ids_to_bitmask(jnp.asarray(deduped), v))
    np.testing.assert_array_equal(dev, host)


@pytest.mark.parametrize("b,v,h,n_valid,k", [(8, 512, 32, 512, 20), (10, 700, 64, 690, 5)])
def test_streaming_topk_matches_dense(b, v, h, n_valid, k):
    rng = np.random.default_rng(2)
    states = jnp.asarray(rng.normal(size=(b, h)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    seen = rng.integers(1, n_valid, size=(b, 17)).astype(np.int32)
    seen[:, 5:] = 0  # padded tails
    bm = jnp.asarray(build_seen_bitmask(seen, v))

    vals, ids = streaming_masked_topk(
        states, table, bm, k=k, n_valid=n_valid, block_b=8, interpret=True
    )

    logits = np.array(states @ table.T)
    rows = np.arange(b)[:, None]
    logits[rows, seen] = 0.0
    logits[:, 0] = 0.0  # bitmask never sets bit 0; dense ref must match
    logits[:, n_valid:] = -np.inf
    order = np.argsort(-logits, axis=1, kind="stable")[:, :k]
    want_vals = np.take_along_axis(logits, order, axis=1)

    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-5, atol=1e-6)
    # ids must score identically (ties may reorder ids)
    got_scores = np.take_along_axis(logits, np.asarray(ids), axis=1)
    np.testing.assert_allclose(got_scores, want_vals, rtol=1e-5, atol=1e-6)
    # and no seen item may surface with nonzero score
    got_ids = np.asarray(ids)
    for r in range(b):
        surfaced = set(got_ids[r].tolist()) & set(seen[r][seen[r] > 0].tolist())
        for s in surfaced:
            assert logits[r, s] == 0.0


def test_streaming_ce_bf16_matches_dense_bf16():
    """dtype="bfloat16": forward and both grads must equal the dense
    path computed with bf16-rounded matmul operands and f32
    accumulation (the bf16 compute policy)."""
    rng = np.random.default_rng(11)
    b, v, h, n_valid = 8, 256, 64, 250
    states = jnp.asarray(rng.normal(size=(b, h)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    answers = jnp.asarray(rng.integers(1, n_valid, size=b).astype(np.int32))

    def dense_bf16(s, t):
        logits = jnp.einsum(
            "bh,vh->bv",
            s.astype(jnp.bfloat16),
            t.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(
            jnp.arange(t.shape[0])[None, :] < n_valid, logits, -jnp.inf
        )
        lz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, answers[:, None], axis=-1)[:, 0]
        return lz - gold

    want = dense_bf16(states, table)
    got = streaming_softmax_ce(
        states, table, answers, n_valid, 8, 128, True, "bfloat16"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)

    g_want = jax.grad(
        lambda s, t: jnp.mean(dense_bf16(s, t)), argnums=(0, 1)
    )(states, table)
    g_got = jax.grad(
        lambda s, t: jnp.mean(
            streaming_softmax_ce(s, t, answers, n_valid, 8, 128, True, "bfloat16")
        ),
        argnums=(0, 1),
    )(states, table)
    # the streaming backward rounds (softmax - onehot)·dloss to bf16
    # before its dots (dense autodiff keeps it f32): small relative slack
    np.testing.assert_allclose(
        np.asarray(g_got[0]), np.asarray(g_want[0]), rtol=0.05, atol=6e-4
    )
    np.testing.assert_allclose(
        np.asarray(g_got[1]), np.asarray(g_want[1]), rtol=0.05, atol=6e-4
    )


def test_streaming_ce_stats_out_of_range_gold_is_zero():
    """ADVICE r2 (medium): with a tile-aligned catalog (vp == v) an
    out-of-range answer used to clip onto the last REAL table row and
    produce a silently wrong nonzero gold. The documented contract —
    out-of-range ids contribute 0 gold, so loss_local == logz_local —
    must hold without callers pre-mapping ids to -1."""
    from bsarec_tpu.ops.pallas_ce import streaming_ce_stats

    rng = np.random.default_rng(7)
    b, v, h = 8, 256, 64  # v == 2*block_v -> vp == v (tile-aligned)
    states = jnp.asarray(rng.normal(size=(b, h)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(v, h)).astype(np.float32))
    # another shard's gold: ids >= v, plus one >= n_valid within range
    answers = jnp.asarray([v, v + 5, 2 * v - 1, -1, 3, v, v + 100, 250],
                          dtype=jnp.int32)
    loss, logz = streaming_ce_stats(
        states, table, answers, n_valid=250, block_b=8, block_v=128,
        interpret=True,
    )
    dense_logz = jax.nn.logsumexp(
        jnp.where(jnp.arange(v)[None, :] < 250, states @ table.T, -jnp.inf),
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(logz), np.asarray(dense_logz), rtol=1e-5)
    # every answer is off-shard / invalid except index 4 (id 3)
    gold = np.asarray(logz - loss)
    want_gold = np.zeros(b, np.float32)
    want_gold[4] = float((states[4] @ table[3]))
    np.testing.assert_allclose(gold, want_gold, rtol=1e-5, atol=1e-5)
