"""AOT serving export (`bsarec_tpu/serving.py`, `--export_serving`).

The artifact is a params-baked, batch-polymorphic jax.export blob of the
eval-exact ranking (predict -> tied-table matmul -> seen-zeroing ->
top-20, `src/trainers.py:62-68,134,142-149` semantics)."""

import logging

import pytest

import jax.numpy as jnp
import numpy as np

from bsarec_tpu.config import ModelConfig, TrainConfig
from bsarec_tpu.data.corpus import Corpus
from bsarec_tpu.data.pipeline import SeqRecData
from bsarec_tpu.serving import build_scoring_fn, export_scorer, load_scorer
from bsarec_tpu.train.trainer import Trainer


def _corpus(n_users=60, n_items=30, seed=0):
    rng = np.random.default_rng(seed)
    seqs = []
    for _ in range(n_users):
        start = rng.integers(1, n_items - 1)
        seq = [(start + i) % (n_items - 1) + 1 for i in range(rng.integers(5, 12))]
        seqs.append(seq)
    return Corpus(user_seq=seqs, max_item=n_items)


def _logger():
    logger = logging.getLogger("test_serving")
    logger.addHandler(logging.NullHandler())
    logger.propagate = False
    return logger


def _trained(tmp_path, model_type="bsarec", **kw):
    corpus = _corpus()
    data = SeqRecData(corpus, max_len=10)
    model_cfg = ModelConfig(
        model_type=model_type, item_size=corpus.item_size,
        num_users=corpus.num_users + 1, max_seq_length=10, hidden_size=16,
        num_hidden_layers=1, num_attention_heads=1, **kw,
    )
    cfg = TrainConfig(lr=0.01, batch_size=32, epochs=1, seed=3)
    t = Trainer(model_cfg, cfg, data, _logger(), str(tmp_path / "s.ckpt"))
    t.train(0)
    return t, data, model_cfg


def test_serving_export_matches_export_topk(tmp_path):
    """The deserialized artifact reproduces the --export_topk serving
    ranking exactly on the real test split (any batch size — the blob
    is batch-polymorphic, here the full user count at once)."""
    t, data, model_cfg = _trained(tmp_path, c=3, alpha=0.7)
    path = str(tmp_path / "scorer.jaxexp")
    meta = export_scorer(
        t.model, t.params, model_cfg.item_size, 10,
        data.test.seen_items.shape[1], path,
    )
    assert meta["bytes"] > 0 and meta["platforms"] == ["cpu", "tpu"]

    scorer = load_scorer(path)
    assert scorer.max_len == 10
    got = scorer.topk(
        data.test.input_ids,
        np.arange(data.test.num_users, dtype=np.int32),
        data.test.seen_items,
    )
    want = t.export_topk("test")
    np.testing.assert_array_equal(got, want)


def test_serving_scorer_batch_polymorphic_and_defaults(tmp_path):
    """One lowering serves every batch size; omitted user_ids/seen
    default to zeros (= mask only the padding column)."""
    t, data, model_cfg = _trained(tmp_path, c=3, alpha=0.7)
    path = str(tmp_path / "scorer.jaxexp")
    export_scorer(t.model, t.params, model_cfg.item_size, 10,
                  data.test.seen_items.shape[1], path)
    scorer = load_scorer(path)
    fn = build_scoring_fn(t.model, model_cfg.item_size)
    for b in (1, 7, 32):
        ids = np.asarray(data.test.input_ids[:b])
        got = scorer.topk(ids)
        want = fn(
            t.params, jnp.asarray(ids), jnp.zeros((b,), jnp.int32),
            jnp.zeros((b, scorer.seen_width), jnp.int32),
        )
        assert got.shape == (b, 20)
        np.testing.assert_array_equal(got, np.asarray(want))


@pytest.mark.slow  # Caser compiles for minutes on the 1-core CPU host
def test_serving_export_user_conditioned_model(tmp_path):
    """Caser consumes user_ids (user-embedding concat,
    `src/model/caser.py:86-118`) — the exported scorer must thread them."""
    t, data, model_cfg = _trained(tmp_path, model_type="caser", nh=2, nv=2)
    path = str(tmp_path / "caser.jaxexp")
    export_scorer(t.model, t.params, model_cfg.item_size, 10,
                  data.test.seen_items.shape[1], path)
    scorer = load_scorer(path)
    ids = np.asarray(data.test.input_ids[:6])
    seen = np.asarray(data.test.seen_items[:6])
    u_a = scorer.topk(ids, np.arange(6, dtype=np.int32), seen)
    u_b = scorer.topk(ids, np.arange(6, 12, dtype=np.int32), seen)
    assert not np.array_equal(u_a, u_b)  # user conditioning is live
    fn = build_scoring_fn(t.model, model_cfg.item_size)
    want = fn(t.params, jnp.asarray(ids),
              jnp.arange(6, dtype=jnp.int32), jnp.asarray(seen))
    np.testing.assert_array_equal(u_a, np.asarray(want))
