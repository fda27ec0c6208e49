"""Training-loop behavior: negative sampling, epoch scan, end-to-end fit."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsarec_tpu.config import ModelConfig, TrainConfig
from bsarec_tpu.data.corpus import Corpus
from bsarec_tpu.data.pipeline import SeqRecData
from bsarec_tpu.train.loop import sample_negatives
from bsarec_tpu.train.trainer import Trainer


def test_sample_negatives_excludes_sample_items():
    key = jax.random.PRNGKey(0)
    inputs = jnp.asarray(
        np.tile(np.concatenate([np.zeros(40, np.int32), np.arange(1, 11, dtype=np.int32)]), (64, 1))
    )
    answers = jnp.full((64,), 11, jnp.int32)
    neg = np.asarray(sample_negatives(key, inputs, answers, item_size=20))
    assert ((neg >= 1) & (neg < 20)).all()
    assert not np.isin(neg, np.arange(1, 12)).any()


def synthetic_corpus(n_users=60, n_items=30, seed=0):
    """Deterministic-pattern sequences a tiny model can learn."""
    rng = np.random.default_rng(seed)
    seqs = []
    for u in range(n_users):
        start = rng.integers(1, n_items - 1)
        length = rng.integers(5, 12)
        seq = [(start + i) % (n_items - 1) + 1 for i in range(length)]
        seqs.append(seq)
    return Corpus(user_seq=seqs, max_item=n_items)


def _quiet_logger():
    logger = logging.getLogger("test_trainer")
    logger.addHandler(logging.NullHandler())
    logger.propagate = False
    return logger


def test_trainer_end_to_end_learns(tmp_path):
    corpus = synthetic_corpus()
    data = SeqRecData(corpus, max_len=10)
    model_cfg = ModelConfig(
        model_type="bsarec", item_size=corpus.item_size, num_users=corpus.num_users + 1,
        max_seq_length=10, hidden_size=16, num_hidden_layers=1, num_attention_heads=1,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1, c=3, alpha=0.7,
    )
    train_cfg = TrainConfig(lr=0.01, batch_size=32, epochs=15, patience=30, seed=42, log_freq=100)
    trainer = Trainer(model_cfg, train_cfg, data, _quiet_logger(), str(tmp_path / "m.ckpt"))

    loss0 = trainer.train(0)
    for e in range(1, 15):
        loss = trainer.train(e)
    assert loss < loss0, (loss0, loss)
    scores, _ = trainer.valid(0)
    # next item is fully deterministic — a fitted model should rank it highly
    assert scores[2] > 0.5  # HR@10


def test_checkpoint_roundtrip(tmp_path):
    corpus = synthetic_corpus()
    data = SeqRecData(corpus, max_len=10)
    model_cfg = ModelConfig(
        model_type="sasrec", item_size=corpus.item_size, num_users=corpus.num_users + 1,
        max_seq_length=10, hidden_size=16, num_hidden_layers=1, num_attention_heads=1,
    )
    train_cfg = TrainConfig(lr=0.005, batch_size=32, epochs=2, seed=1, log_freq=100)
    trainer = Trainer(model_cfg, train_cfg, data, _quiet_logger(), str(tmp_path / "m.ckpt"))
    trainer.train(0)
    s1, _ = trainer.valid(0)
    trainer.save()
    trainer.train(1)  # mutate params
    trainer.load()
    s2, _ = trainer.valid(0)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_contrastive_model_trains(tmp_path):
    corpus = synthetic_corpus()
    data = SeqRecData(corpus, max_len=10)
    model_cfg = ModelConfig(
        model_type="duorec", item_size=corpus.item_size, num_users=corpus.num_users + 1,
        max_seq_length=10, hidden_size=16, num_hidden_layers=1, num_attention_heads=1,
    )
    train_cfg = TrainConfig(lr=0.005, batch_size=32, epochs=1, seed=1, log_freq=100)
    trainer = Trainer(model_cfg, train_cfg, data, _quiet_logger(), str(tmp_path / "m.ckpt"))
    loss = trainer.train(0)
    assert np.isfinite(loss)


def test_streaming_eval_matches_dense(tmp_path):
    """The Pallas streaming rank path (used on TPU for 256k+ catalogs)
    produces the same HR/NDCG as the dense XLA path (interpret mode)."""
    corpus = synthetic_corpus()
    data = SeqRecData(corpus, max_len=10)
    model_cfg = ModelConfig(
        model_type="bsarec", item_size=corpus.item_size, num_users=corpus.num_users + 1,
        max_seq_length=10, hidden_size=16, num_hidden_layers=1, num_attention_heads=1,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1, c=3, alpha=0.7,
    )
    base = TrainConfig(lr=0.01, batch_size=32, epochs=1, seed=9, log_freq=100)
    dense = Trainer(model_cfg, base, data, _quiet_logger(), str(tmp_path / "d.ckpt"))
    dense.train(0)

    import dataclasses

    stream_cfg = dataclasses.replace(base, eval_impl="streaming")
    stream = Trainer(model_cfg, stream_cfg, data, _quiet_logger(), str(tmp_path / "s.ckpt"))
    assert stream.eval_impl == "streaming"
    stream.params = dense.params  # identical weights

    s_dense, _ = dense.valid(0)
    s_stream, _ = stream.valid(0)
    np.testing.assert_allclose(np.asarray(s_stream), np.asarray(s_dense), atol=1e-6)


def test_resume_from_state_snapshot(tmp_path):
    """Crash recovery: params + Adam moments + PRNG round-trip exactly."""
    corpus = synthetic_corpus()
    data = SeqRecData(corpus, max_len=10)
    model_cfg = ModelConfig(
        model_type="sasrec", item_size=corpus.item_size, num_users=corpus.num_users + 1,
        max_seq_length=10, hidden_size=16, num_hidden_layers=1, num_attention_heads=1,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
    )
    cfg = TrainConfig(lr=0.01, batch_size=32, epochs=2, seed=3, log_freq=100)
    a = Trainer(model_cfg, cfg, data, _quiet_logger(), str(tmp_path / "a.ckpt"))
    a.train(0)
    a.save_state(0)

    b = Trainer(model_cfg, cfg, data, _quiet_logger(), str(tmp_path / "a.ckpt"))
    next_epoch = b.resume()
    assert next_epoch == 1
    same = jax.tree.map(lambda x, y: np.allclose(x, y), a.params, b.params)
    assert all(jax.tree.leaves(same))
    same_opt = jax.tree.map(
        lambda x, y: np.allclose(x, y), jax.tree.leaves(a.opt_state), jax.tree.leaves(b.opt_state)
    )
    assert all(jax.tree.leaves(same_opt))
    # training continues identically from the snapshot
    la = a.train(1)
    lb = b.train(1)
    assert abs(la - lb) < 1e-6


def test_same_seed_runs_are_identical(tmp_path):
    """SURVEY §4: the reference relies on deterministic seeding to make
    runs comparable (`src/utils.py:31-38`); here two same-seed Trainers
    must match exactly (pure-functional PRNG threading), and a different
    seed must actually change the run."""
    corpus = synthetic_corpus()
    data = SeqRecData(corpus, max_len=10)
    model_cfg = ModelConfig(
        model_type="bsarec", item_size=corpus.item_size, num_users=corpus.num_users + 1,
        max_seq_length=10, hidden_size=16, num_hidden_layers=1, num_attention_heads=1,
        c=3, alpha=0.7,
    )
    cfg = TrainConfig(lr=0.01, batch_size=32, epochs=1, seed=7, log_freq=100)
    runs = []
    for name in ("a", "b"):
        t = Trainer(model_cfg, cfg, data, _quiet_logger(), str(tmp_path / f"{name}.ckpt"))
        loss = t.train(0)
        scores, _ = t.valid(0)
        runs.append((loss, np.asarray(scores)))
    assert runs[0][0] == runs[1][0]
    np.testing.assert_array_equal(runs[0][1], runs[1][1])

    import dataclasses

    other = Trainer(model_cfg, dataclasses.replace(cfg, seed=8), data,
                    _quiet_logger(), str(tmp_path / "c.ckpt"))
    assert other.train(0) != runs[0][0]


def test_resume_rejects_mismatched_model_config(tmp_path):
    """A relaunch that omits CLI flags rebuilds the model from DEFAULTS;
    if the architecture differs from the snapshot's, resume must fail
    loudly even when every param shape still matches (a head-count
    change keeps all shapes identical — caught live when a resumed
    LastFM run silently went 1 head -> 2)."""
    corpus = synthetic_corpus()
    data = SeqRecData(corpus, max_len=10)
    model_cfg = ModelConfig(
        model_type="sasrec", item_size=corpus.item_size, num_users=corpus.num_users + 1,
        max_seq_length=10, hidden_size=16, num_hidden_layers=1, num_attention_heads=1,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
    )
    cfg = TrainConfig(lr=0.01, batch_size=32, epochs=2, seed=3, log_freq=100)
    a = Trainer(model_cfg, cfg, data, _quiet_logger(), str(tmp_path / "a.ckpt"))
    a.train(0)
    a.save_state(0)

    two_heads = model_cfg.replace(num_attention_heads=2)  # same param shapes
    b = Trainer(two_heads, cfg, data, _quiet_logger(), str(tmp_path / "a.ckpt"))
    with pytest.raises(ValueError, match="num_attention_heads.*(1, 2)"):
        b.resume()

    # the matching config still resumes; loss_impl differences are
    # allowed (numerically equivalent implementations)
    c = Trainer(model_cfg.replace(loss_impl="dense"), cfg, data,
                _quiet_logger(), str(tmp_path / "a.ckpt"))
    assert c.resume() == 1

    # pre-fingerprint snapshots (no config_fp key) still load
    from bsarec_tpu.train import checkpoint as ckpt_mod
    legacy = dict(
        params=jax.device_get(a.params), opt_state=jax.device_get(a.opt_state),
        epoch=0, rng=jax.device_get(a.rng),
        best_score=np.full((1,), -np.inf, np.float32), patience_counter=0,
    )
    import flax.serialization
    ckpt_mod._atomic_write(a.state_path, flax.serialization.to_bytes(legacy))
    d = Trainer(two_heads, cfg, data, _quiet_logger(), str(tmp_path / "a.ckpt"))
    assert d.resume() == 1  # no fingerprint recorded -> cannot check


def test_resume_restores_early_stopping_state(tmp_path):
    """A resumed run must not let its first (possibly worse) validation
    overwrite the pre-crash best checkpoint, nor reset the patience
    counter (round-1 advisor finding)."""
    from bsarec_tpu.utils.early_stopping import EarlyStopping

    corpus = synthetic_corpus()
    data = SeqRecData(corpus, max_len=10)
    model_cfg = ModelConfig(
        model_type="sasrec", item_size=corpus.item_size, num_users=corpus.num_users + 1,
        max_seq_length=10, hidden_size=16, num_hidden_layers=1, num_attention_heads=1,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
    )
    cfg = TrainConfig(lr=0.01, batch_size=32, epochs=2, seed=3, log_freq=100)
    a = Trainer(model_cfg, cfg, data, _quiet_logger(), str(tmp_path / "a.ckpt"))
    saves = []
    stopper = EarlyStopping(save_fn=lambda _: saves.append(1), patience=10)
    stopper(np.array([0.5]), None)  # establishes best=0.5
    stopper(np.array([0.3]), None)  # counter -> 1
    a.save_state(0, stopper)

    b = Trainer(model_cfg, cfg, data, _quiet_logger(), str(tmp_path / "a.ckpt"))
    b.resume()
    best, counter = b._resume_stopper
    np.testing.assert_allclose(best, [0.5])
    assert counter == 1
    # a seeded stopper does NOT save on a worse first post-resume score
    seeded = EarlyStopping(save_fn=lambda _: saves.append(2), patience=10)
    seeded.best_score, seeded.counter = best, counter
    seeded(np.array([0.4]), None)
    assert saves == [1] and seeded.counter == 2


def test_mesh_parallel_training_matches_single_device(tmp_path):
    """data:4,model:2 mesh training (8 virtual CPU devices) follows the
    single-device loss trajectory and reproduces its eval metrics — the
    SPMD partitioning must be semantics-preserving."""
    corpus = synthetic_corpus(n_items=31)  # item_size 32: divisible by model axis
    data = SeqRecData(corpus, max_len=10)
    model_cfg = ModelConfig(
        model_type="bsarec", item_size=corpus.item_size, num_users=corpus.num_users + 1,
        max_seq_length=10, hidden_size=16, num_hidden_layers=1, num_attention_heads=1,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1, c=3, alpha=0.7,
    )
    base = TrainConfig(lr=0.01, batch_size=32, epochs=2, seed=11, log_freq=100)
    single = Trainer(model_cfg, base, data, _quiet_logger(), str(tmp_path / "s.ckpt"))

    import dataclasses

    mesh_cfg = dataclasses.replace(base, mesh="data:4,model:2")
    meshed = Trainer(model_cfg, mesh_cfg, data, _quiet_logger(), str(tmp_path / "m.ckpt"))
    assert meshed.mesh is not None and dict(meshed.mesh.shape) == {"data": 4, "model": 2}
    # the item table is genuinely row-sharded over the model axis
    table_sharding = meshed.params["item_embeddings"]["embedding"].sharding
    assert "model" in str(table_sharding.spec)

    losses_s = [single.train(e) for e in range(2)]
    losses_m = [meshed.train(e) for e in range(2)]
    np.testing.assert_allclose(losses_m, losses_s, rtol=2e-4)

    ms, _ = single.valid(0)
    mm, _ = meshed.valid(0)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(ms), atol=1e-5)


def test_throughput_accumulator_skips_compile_epoch():
    import time as _time

    from bsarec_tpu.utils.profiling import Throughput

    t = Throughput()
    t.start(); _time.sleep(0.002); t.stop(100)  # compile epoch: excluded
    t.start(); _time.sleep(0.002); t.stop(100)
    t.start(); _time.sleep(0.002); rate = t.stop(100)
    assert rate > 0 and t.steady_rate > 0


def test_vocab_sharded_mesh_impl_selection(tmp_path):
    """pallas_call has no SPMD partitioning rule: a vocab-sharded table
    routes streaming requests into the shard_map composition
    ("sharded_streaming", parallel/logits.py), never the raw kernels;
    "auto" stays dense off-TPU / for small catalogs."""
    import dataclasses

    corpus = synthetic_corpus(n_items=31)  # item_size 32, divisible by model:2
    data = SeqRecData(corpus, max_len=10)
    model_cfg = ModelConfig(
        model_type="bsarec", item_size=corpus.item_size, num_users=corpus.num_users + 1,
        max_seq_length=10, hidden_size=16, num_hidden_layers=1, num_attention_heads=1,
        c=3, alpha=0.7,
    )
    cfg = TrainConfig(lr=0.01, batch_size=32, epochs=1, seed=1, mesh="data:4,model:2")
    t = Trainer(model_cfg, cfg, data, _quiet_logger(), str(tmp_path / "m.ckpt"))
    assert t._vocab_sharded
    assert t.model_cfg.loss_impl == "dense"  # auto: small catalog on CPU
    assert t.eval_impl == "dense"
    # explicit streaming request composes with the mesh via shard_map
    cfg2 = dataclasses.replace(cfg, eval_impl="streaming")
    t2 = Trainer(
        model_cfg.replace(loss_impl="streaming"), cfg2, data,
        _quiet_logger(), str(tmp_path / "m2.ckpt"),
    )
    assert t2.model_cfg.loss_impl == "sharded_streaming"
    assert t2.eval_impl == "sharded_streaming"
    # BERT4Rec's (item_size + 1)-row table is not row-shardable: dense
    bert_cfg = model_cfg.replace(model_type="bert4rec", loss_impl="streaming")
    t3 = Trainer(bert_cfg, cfg2, data, _quiet_logger(), str(tmp_path / "m3.ckpt"))
    assert t3.model_cfg.loss_impl == "dense"
    assert t3.eval_impl == "dense"


def test_mesh_streaming_training_matches_single_device(tmp_path):
    """The shard_map-composed streaming kernels (loss AND eval) follow
    the single-device dense trajectory on a data:4,model:2 mesh — the
    VERDICT round-1 headline gap (streaming × vocab sharding)."""
    import dataclasses

    corpus = synthetic_corpus(n_items=31)
    data = SeqRecData(corpus, max_len=10)
    model_cfg = ModelConfig(
        model_type="bsarec", item_size=corpus.item_size, num_users=corpus.num_users + 1,
        max_seq_length=10, hidden_size=16, num_hidden_layers=1, num_attention_heads=1,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1, c=3, alpha=0.7,
    )
    base = TrainConfig(lr=0.01, batch_size=32, epochs=2, seed=11, log_freq=100)
    single = Trainer(model_cfg, base, data, _quiet_logger(), str(tmp_path / "s.ckpt"))

    mesh_cfg = dataclasses.replace(
        base, mesh="data:4,model:2", eval_impl="streaming"
    )
    meshed = Trainer(
        model_cfg.replace(loss_impl="streaming"), mesh_cfg, data,
        _quiet_logger(), str(tmp_path / "m.ckpt"),
    )
    assert meshed.model_cfg.loss_impl == "sharded_streaming"
    assert meshed.eval_impl == "sharded_streaming"

    losses_s = [single.train(e) for e in range(2)]
    losses_m = [meshed.train(e) for e in range(2)]
    np.testing.assert_allclose(losses_m, losses_s, rtol=2e-4)

    ms, _ = single.valid(0)
    mm, _ = meshed.valid(0)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(ms), atol=1e-5)


def test_cli_round2_flags_parse():
    """Round-2 CLI surface: --prng/--multihost/--dtype/--mesh parse and
    map onto the configs."""
    from bsarec_tpu.main import configs_from_args, parse_args

    args = parse_args([
        "--data_name", "Beauty", "--model_type", "BSARec", "--c", "5",
        "--alpha", "0.7", "--prng", "rbg", "--multihost",
        "--dtype", "bf16", "--mesh", "data:4,model:2",
        "--eval_impl", "streaming",
        "--scan_unroll", "1", "--remat",
    ])
    assert args.prng == "rbg" and args.multihost
    model_cfg, train_cfg = configs_from_args(args, item_size=32, num_users=8)
    assert model_cfg.compute_dtype == "bfloat16"
    assert train_cfg.multihost and train_cfg.mesh == "data:4,model:2"
    assert train_cfg.eval_impl == "streaming"
    assert train_cfg.scan_unroll == 1 and train_cfg.remat


def test_export_topk_matches_eval_ranking(tmp_path):
    """export_topk (--export_topk serving path): [num_users, 20] item
    ids, seen-masked, and the exact ranking the metrics come from —
    HR@20 recomputed from the export equals the test() metric."""
    corpus = synthetic_corpus()
    data = SeqRecData(corpus, max_len=10)
    model_cfg = ModelConfig(
        model_type="sasrec", item_size=corpus.item_size,
        num_users=corpus.num_users + 1, max_seq_length=10, hidden_size=16,
        num_hidden_layers=1, num_attention_heads=1,
    )
    cfg = TrainConfig(lr=0.01, batch_size=32, epochs=1, seed=3)
    t = Trainer(model_cfg, cfg, data, _quiet_logger(), str(tmp_path / "e.ckpt"))
    t.train(0)
    scores, _ = t.test(0)
    topk = t.export_topk("test")
    assert topk.shape == (data.test.num_users, 20)
    # HR@20 recomputed from the exported ids equals test()'s metric
    hr20 = float(np.mean([data.test.answers[u] in topk[u] for u in range(topk.shape[0])]))
    np.testing.assert_allclose(hr20, scores[4], atol=1e-6)  # scores[4] = HR@20
    # independent recomputation: forward + reference zero-masking
    # (`masked_topk` zeroes seen scores like src/trainers.py:134 — it
    # does not -inf them) must reproduce the exported rows exactly
    from bsarec_tpu.ops.topk import masked_topk

    out = t.model.apply(
        {"params": t.params}, jnp.asarray(data.test.input_ids[:8]),
        method="predict",
    )[:, -1, :]
    logits = jnp.einsum(
        "bh,vh->bv", out, t.params["item_embeddings"]["embedding"][:corpus.item_size]
    )
    _, expect = masked_topk(logits, jnp.asarray(data.test.seen_items[:8]))
    np.testing.assert_array_equal(topk[:8], np.asarray(expect))


def test_trainer_load_restores_mesh_placement(tmp_path):
    """load() (fit()'s best-checkpoint reload path) must reapply mesh
    placement like resume() does — restored host arrays would otherwise
    silently lose the vocab sharding and the final test would run with a
    replicated table (fatal at 10M-item scale)."""
    import dataclasses

    corpus = synthetic_corpus(n_items=31)
    data = SeqRecData(corpus, max_len=10)
    model_cfg = ModelConfig(
        model_type="bsarec", item_size=corpus.item_size, num_users=corpus.num_users + 1,
        max_seq_length=10, hidden_size=16, num_hidden_layers=1, num_attention_heads=1,
        c=3, alpha=0.7,
    )
    cfg = TrainConfig(lr=0.01, batch_size=32, epochs=1, seed=7, mesh="data:4,model:2")
    t = Trainer(model_cfg, cfg, data, _quiet_logger(), str(tmp_path / "m.ckpt"))
    t.train(0)
    before, _ = t.valid(0)
    t.save()
    t.load()
    table = t.params["item_embeddings"]["embedding"]
    assert "model" in str(table.sharding.spec), table.sharding
    after, _ = t.valid(0)
    np.testing.assert_allclose(np.asarray(after), np.asarray(before), atol=1e-6)

    # install_params (the --load_torch_model path in main.py) must apply
    # the same placement to plain host arrays
    host_params = jax.tree.map(np.asarray, t.params)
    t.install_params(host_params)
    table = t.params["item_embeddings"]["embedding"]
    assert "model" in str(table.sharding.spec), table.sharding
    again, _ = t.valid(0)
    np.testing.assert_allclose(np.asarray(again), np.asarray(before), atol=1e-6)


def test_dump_sequence_outputs_reference_layout(tmp_path):
    """dump_sequence_outputs (--dump_seqout): reference-layout per-layer
    dumps that round-trip through load_sequence_outputs and equal a
    direct all-layers forward (incl. the padded last partial batch)."""
    from bsarec_tpu.utils.visualize import load_sequence_outputs

    corpus = synthetic_corpus()
    data = SeqRecData(corpus, max_len=10)
    model_cfg = ModelConfig(
        model_type="bsarec", item_size=corpus.item_size,
        num_users=corpus.num_users + 1, max_seq_length=10, hidden_size=16,
        num_hidden_layers=2, num_attention_heads=1, c=3, alpha=0.7,
    )
    cfg = TrainConfig(lr=0.01, batch_size=32, epochs=1, seed=3)
    t = Trainer(model_cfg, cfg, data, _quiet_logger(), str(tmp_path / "d.ckpt"))
    b = 16  # forces a partial last batch unless num_users % 16 == 0
    n = t.dump_sequence_outputs(str(tmp_path), "Synth_BSARec", batch_size=b)
    assert n == -(-data.test.num_users // b)
    outs = t.model.apply(
        {"params": t.params}, jnp.asarray(data.test.input_ids),
        train=False, all_layers=True,
    )
    layers = load_sequence_outputs(
        tmp_path / "Synth_BSARec", n_layers=len(outs) - 1)
    assert len(layers) == len(outs)
    for got, want in zip(layers, outs):
        np.testing.assert_allclose(
            got, np.asarray(want)[:, -1, :], rtol=2e-5, atol=1e-6)
