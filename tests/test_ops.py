"""Masks, losses, top-k eval vs closed-form / numpy ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from bsarec_tpu.ops.losses import (
    bpr_loss,
    full_softmax_ce,
    info_nce_logits,
    pair_bce_masked,
    pair_logsigmoid_bce,
)
from bsarec_tpu.ops.masks import bidirectional_additive_mask, causal_additive_mask
from bsarec_tpu.ops.topk import EVAL_KS, masked_topk, metrics_from_sums, topk_metrics


def test_causal_mask():
    ids = jnp.array([[0, 0, 3, 4], [1, 2, 3, 4]], dtype=jnp.int32)
    mask = np.asarray(causal_additive_mask(ids))
    assert mask.shape == (2, 1, 4, 4)
    # row 2 (query pos 2) of batch 0: keys 0,1 are padding -> -1e4; key 2 ok; key 3 future
    np.testing.assert_array_equal(mask[0, 0, 2], [-10000.0, -10000.0, 0.0, -10000.0])
    # full batch 1: lower-triangular zeros
    want = np.where(np.tril(np.ones((4, 4))) > 0, 0.0, -10000.0)
    np.testing.assert_array_equal(mask[1, 0], want)


def test_bidirectional_mask():
    ids = jnp.array([[0, 2, 0, 4]], dtype=jnp.int32)
    mask = np.asarray(bidirectional_additive_mask(ids))
    assert mask.shape == (1, 1, 1, 4)
    np.testing.assert_array_equal(mask[0, 0, 0], [-10000.0, 0.0, -10000.0, 0.0])


def test_full_softmax_ce_matches_numpy():
    rng = np.random.default_rng(0)
    state = rng.normal(size=(6, 8)).astype(np.float32)
    table = rng.normal(size=(30, 8)).astype(np.float32)
    answers = rng.integers(1, 30, size=6)
    got = float(full_softmax_ce(jnp.asarray(state), jnp.asarray(table), jnp.asarray(answers)))
    logits = state @ table.T
    logz = np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(1)) + logits.max(1)
    want = float(np.mean(logz - logits[np.arange(6), answers]))
    assert abs(got - want) < 1e-5


def test_pair_losses_closed_form():
    pos = jnp.array([1.0, -2.0, 0.5])
    neg = jnp.array([0.3, 0.1, -1.0])
    ids = jnp.array([5, 7, 9])

    got = float(pair_bce_masked(pos, neg, ids))
    sp = lambda x: np.log1p(np.exp(-np.abs(x))) + np.maximum(-x, 0)  # softplus(-x)
    want = float(np.mean(sp(np.asarray(pos))) + np.mean(sp(-np.asarray(neg))))
    assert abs(got - want) < 1e-6

    got = float(bpr_loss(pos, neg))
    want = float(np.mean(-np.log(1e-10 + 1 / (1 + np.exp(-(np.asarray(pos) - np.asarray(neg)))))))
    assert abs(got - want) < 1e-6

    got = float(pair_logsigmoid_bce(pos, neg))
    sig = lambda x: 1 / (1 + np.exp(-x))
    want = float(np.mean(-np.log(sig(np.asarray(pos)) + 1e-24) - np.log(1 - sig(np.asarray(neg)) + 1e-24)))
    assert abs(got - want) < 1e-6


def test_info_nce_matches_reference_construction():
    """Direct numpy re-derivation of duorec.py:47-74 (dot sim)."""
    rng = np.random.default_rng(1)
    b, h = 5, 8
    z_i = rng.normal(size=(b, h)).astype(np.float32)
    z_j = rng.normal(size=(b, h)).astype(np.float32)
    temp = 0.7
    got = float(info_nce_logits(jnp.asarray(z_i), jnp.asarray(z_j), temp, "dot"))

    z = np.concatenate([z_i, z_j], 0)
    sim = (z @ z.T) / temp
    n = 2 * b
    mask = np.ones((n, n), dtype=bool)
    np.fill_diagonal(mask, False)
    for i in range(b):
        mask[i, b + i] = False
        mask[b + i, i] = False
    losses = []
    for i in range(n):
        pos = sim[i, (i + b) % n]
        negs = sim[i][mask[i]]
        row = np.concatenate([[pos], negs])
        m = row.max()
        losses.append(-(pos - m) + np.log(np.exp(row - m).sum()))
    want = float(np.mean(losses))
    assert abs(got - want) < 1e-4


def test_masked_topk_and_metrics_match_reference_eval():
    """Emulates src/trainers.py:126-149 + src/metrics.py in numpy."""
    rng = np.random.default_rng(2)
    b, v = 16, 300
    scores = rng.normal(size=(b, v)).astype(np.float32)
    seen = rng.integers(1, v, size=(b, 7)).astype(np.int32)
    seen[:, -2:] = 0  # padding entries
    answers = rng.integers(1, v, size=b).astype(np.int32)
    # ensure answers are not 'seen'
    for i in range(b):
        while answers[i] in seen[i]:
            answers[i] = rng.integers(1, v)

    _, topk_idx = masked_topk(jnp.asarray(scores), jnp.asarray(seen))
    sums = topk_metrics(topk_idx, jnp.asarray(answers), jnp.ones((b,)))
    got = metrics_from_sums(np.asarray(sums))

    ref = scores.copy()
    for i in range(b):
        ref[i, seen[i]] = 0.0
    ind = np.argpartition(ref, -20)[:, -20:]
    arr = ref[np.arange(b)[:, None], ind]
    order = np.argsort(arr)[np.arange(b), ::-1]
    pred = ind[np.arange(b)[:, None], order]

    import math

    for k in EVAL_KS:
        hr = np.mean([answers[i] in pred[i][:k] for i in range(b)])
        ndcg = np.mean(
            [
                sum(
                    int(pred[i][j] == answers[i]) / math.log(j + 2, 2)
                    for j in range(k)
                )
                for i in range(b)
            ]
        )
        assert abs(got[f"HR@{k}"] - hr) < 1e-6, k
        assert abs(got[f"NDCG@{k}"] - ndcg) < 1e-5, k


def test_fast_dropout_semantics():
    """fast_dropout: iid Bernoulli(1-rate) keep + 1/(1-rate) scale, on
    both the p=0.5 bit-unpack path and the integer-threshold path."""
    import jax

    from bsarec_tpu.core.dropout import fast_dropout

    x = jnp.ones((64, 97))  # odd last dim: exercises pad+slice
    for rate in (0.5, 0.2):
        y = np.asarray(fast_dropout(jax.random.PRNGKey(0), rate, x))
        zeros = (y == 0).mean()
        kept = y[y != 0]
        np.testing.assert_allclose(kept, 1.0 / (1.0 - rate), rtol=1e-6)
        assert abs(zeros - rate) < 0.02, (rate, zeros)
        # iid across the last axis (bit-unpack must not correlate lanes)
        col_drop = (y == 0).mean(axis=0)
        assert col_drop.std() < 0.15, col_drop.std()


def test_fast_dropout_u8_strategy(monkeypatch):
    """BSAREC_DROPOUT=u8: masks from uint8 lanes bitcast out of 4x fewer
    RNG words — exact Bernoulli at p=0.5, correct scale, no lane
    correlation, odd last dims padded+sliced."""
    import jax

    from bsarec_tpu.core.dropout import fast_dropout

    monkeypatch.setenv("BSAREC_DROPOUT", "u8")
    for shape in ((64, 97), (64, 96), (5000,)):
        x = jnp.ones(shape)
        y = np.asarray(fast_dropout(jax.random.PRNGKey(7), 0.5, x))
        zeros = (y == 0).mean()
        kept = y[y != 0]
        np.testing.assert_allclose(kept, 2.0, rtol=1e-6)
        assert abs(zeros - 0.5) < 0.03, (shape, zeros)
        if y.ndim == 2:
            # iid across the last axis (bitcast lanes must not correlate)
            col_drop = (y == 0).mean(axis=0)
            assert col_drop.std() < 0.15, col_drop.std()
            flat = (y == 0).astype(np.int64)
            a, b = flat[:, :-1].ravel(), flat[:, 1:].ravel()
            assert abs(np.corrcoef(a, b)[0, 1]) < 0.03
    # non-dyadic rate: quantized to nearest 1/256 (documented contract)
    y = np.asarray(fast_dropout(jax.random.PRNGKey(8), 0.2, jnp.ones((512, 128))))
    assert abs((y == 0).mean() - round(0.2 * 256) / 256) < 0.01
    np.testing.assert_allclose(y[y != 0], 1.25, rtol=1e-6)


def test_fast_dropout_rbg_bitpath_on_rbg_keys():
    """The p=0.5 path draws 32x fewer RNG words; the unpacked bits must
    still be unbiased and independent between consecutive elements."""
    import jax

    from bsarec_tpu.core.dropout import _keep_mask_bits

    bits = np.asarray(
        _keep_mask_bits(jax.random.PRNGKey(3), (256, 64))
    ).astype(np.int64)
    assert abs(bits.mean() - 0.5) < 0.01
    # lag-1 correlation along the unpacked axis ~ 0
    a, b = bits[:, :-1].ravel(), bits[:, 1:].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.02, corr


def test_fast_dropout_scalar_input_all_strategies(monkeypatch):
    """0-d inputs work under every mask strategy (the lane-packed paths
    pad to one word internally and must reshape back to ())."""
    import jax

    from bsarec_tpu.core.dropout import fast_dropout

    for strategy in ("threshold", "bernoulli", "bits", "u8"):
        monkeypatch.setenv("BSAREC_DROPOUT", strategy)
        y = fast_dropout(jax.random.PRNGKey(0), 0.5, jnp.float32(3.0))
        assert y.shape == ()
        assert float(y) in (0.0, 6.0), (strategy, float(y))


def test_fast_dropout_pallas_strategy_fallback(monkeypatch):
    """BSAREC_DROPOUT=pallas off-TPU: must fall back to the threshold
    construction with correct semantics (the fused kernel itself is
    TPU-only — Mosaic PRNG has no CPU lowering; on-chip validation:
    results/r4_runs/pallas_dropout_validate.log)."""
    import jax

    from bsarec_tpu.core.dropout import fast_dropout

    monkeypatch.setenv("BSAREC_DROPOUT", "pallas")
    x = jnp.ones((64, 16, 8))  # 8192 elems: WOULD take the fused path on TPU
    y = np.asarray(fast_dropout(jax.random.PRNGKey(3), 0.5, x))
    np.testing.assert_allclose(y[y != 0], 2.0, rtol=1e-6)
    assert abs((y == 0).mean() - 0.5) < 0.03
    # odd-size input: unsupported by the kernel everywhere -> threshold
    y = np.asarray(fast_dropout(jax.random.PRNGKey(3), 0.2, jnp.ones((64, 97))))
    np.testing.assert_allclose(y[y != 0], 1.25, rtol=1e-6)
    assert abs((y == 0).mean() - 0.2) < 0.03


def test_pallas_dropout_support_gating():
    """supported(): full-lane flat views with a whole-block partition
    only — everything else must route to the XLA fallback."""
    from bsarec_tpu.ops.pallas_dropout import _block_rows, supported

    assert supported((256, 50, 64), jnp.float32) == 6400
    assert supported((256, 1, 50, 50), jnp.bfloat16) == 5000
    assert supported((64, 97), jnp.float32) == 0  # not lane-divisible
    assert supported((16, 8), jnp.float32) == 0  # 128 elems = 1 row < min block
    assert supported((256, 50, 64), jnp.int32) == 0  # non-float dtype
    assert _block_rows(6400) == 800 and 5000 % _block_rows(5000) == 0


def test_pallas_dropout_seed_from_key():
    """seed_from_key: deterministic per key, distinct across keys, and
    well-defined for both 2-word threefry and 4-word rbg key data."""
    import jax

    from bsarec_tpu.ops.pallas_dropout import seed_from_key

    k = jax.random.PRNGKey(42)
    s1, s2 = seed_from_key(k), seed_from_key(k)
    assert s1.shape == (2,) and s1.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    other = seed_from_key(jax.random.PRNGKey(43))
    assert not np.array_equal(np.asarray(s1), np.asarray(other))
    folded = seed_from_key(jax.random.split(k, 2)[0])
    assert folded.shape == (2,)


def test_fast_dropout_u8direct_strategy(monkeypatch):
    """BSAREC_DROPOUT=u8direct: uint8 words straight from the
    generator — quantized to the nearest 1/256 (exact at p=0.5),
    correct scale, no lane correlation."""
    import jax

    from bsarec_tpu.core.dropout import fast_dropout

    monkeypatch.setenv("BSAREC_DROPOUT", "u8direct")
    for rate, scale in ((0.5, 2.0), (0.2, 1.25)):
        y = np.asarray(fast_dropout(jax.random.PRNGKey(5), rate, jnp.ones((512, 128))))
        np.testing.assert_allclose(y[y != 0], scale, rtol=1e-6)
        assert abs((y == 0).mean() - round(rate * 256) / 256) < 0.02, rate
        flat = (y == 0).astype(np.int64)
        a, b = flat[:, :-1].ravel(), flat[:, 1:].ravel()
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.03


def test_pooled_dropout_strategy(monkeypatch):
    """BSAREC_DROPOUT=pooled: the count-then-pool wrapper issues ONE
    jax.random.bits call per step and every FastDropout site slices it
    (VERDICT r4 item 5). Checks: the demand-counting pass totals the
    site sizes; pooled masks are Bernoulli(1-rate) with the right scale;
    disjoint sites get independent bits; a jitted multi-site loss under
    the wrapper differentiates and matches the threshold strategy's
    loss distribution (same law, different stream)."""
    import jax

    from bsarec_tpu.core.dropout import dropout_bit_pool, fast_dropout
    from bsarec_tpu.train.loop import _with_dropout_pool

    monkeypatch.setenv("BSAREC_DROPOUT", "pooled")

    # counting pass totals per-site word demand
    x1, x2 = jnp.ones((16, 32)), jnp.ones((8, 8, 8))
    with dropout_bit_pool(None) as counter:
        jax.eval_shape(lambda k: fast_dropout(k, 0.5, x1), jax.random.PRNGKey(0))
        jax.eval_shape(lambda k: fast_dropout(k, 0.5, x2), jax.random.PRNGKey(0))
    assert counter.offset == 16 * 32 + 8 * 8 * 8

    # pooled masks: correct law + scale, sites independent
    words = jax.random.bits(jax.random.PRNGKey(1), (counter.offset,), jnp.uint32)
    with dropout_bit_pool(words):
        y1 = np.asarray(fast_dropout(jax.random.PRNGKey(0), 0.5, x1))
        y2 = np.asarray(fast_dropout(jax.random.PRNGKey(0), 0.5, x2))
    for y in (y1, y2):
        np.testing.assert_allclose(y[y != 0], 2.0, rtol=1e-6)
        assert abs((y == 0).mean() - 0.5) < 0.06
    a = (y1.ravel()[: y2.size] == 0).astype(np.int64)
    b = (y2.ravel() == 0).astype(np.int64)
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.05  # disjoint slices

    # pool exhaustion is a loud error, not silent reuse
    short = jax.random.bits(jax.random.PRNGKey(2), (10,), jnp.uint32)
    with dropout_bit_pool(short):
        try:
            fast_dropout(jax.random.PRNGKey(0), 0.5, x1)
            raise AssertionError("expected pool-exhaustion ValueError")
        except ValueError as e:
            assert "exhausted" in str(e)

    # end-to-end: the wrapper is jittable and differentiable; without an
    # rbg PRNG pool_enabled() is False, so force the scope path directly
    def apply(params, batch, key):
        h = fast_dropout(key, 0.5, batch * params)
        h = fast_dropout(key, 0.5, h + 1.0)
        return jnp.sum(h)

    wrapped = _with_dropout_pool(apply)
    batch = jnp.ones((4, 8))
    loss, grad = jax.jit(jax.value_and_grad(wrapped))(
        2.0, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss)) and np.isfinite(float(grad))
