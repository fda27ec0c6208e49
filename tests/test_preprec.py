"""PREPRec subsystem: preprocessing artifacts, popularity gathers,
samplers, and end-to-end training of each model on synthetic data."""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsarec_tpu.preprec.config import PrepRecConfig, PrepRecTrainConfig
from bsarec_tpu.preprec.data import load_intwtime, load_userneg
from bsarec_tpu.preprec.popularity import PopularityEncoding, PopularityTable
from bsarec_tpu.preprec.preprocess import (
    eval_negatives,
    kcore_filter,
    pop_embed_vec,
    preprocess,
    week_adjustment,
)
from bsarec_tpu.preprec.sampler import augment_batch, cloze_mask, permute_user_items
from bsarec_tpu.preprec.train import PrepRecTrainer


def reference_pop_embed(perc, num):
    """Closed-form re-derivation of `repo-b/data/data.py:32-46`."""
    if perc == 0:
        return [0.0] * (num + 1)
    rev = 100 // num
    loc = min(int(perc // rev), num)
    res = [0.0] * (num + 1)
    if perc % rev == 0:
        res[loc] = 1.0
    elif loc < num:
        res[loc] = 1 - (perc % rev) / rev
        res[loc + 1] = (perc % rev) / rev
    return res


def test_pop_embed_vectorized_matches_scalar():
    percs = np.array([0.0, 10.0, 25.0, 33.3, 50.0, 99.0, 100.0])
    got = pop_embed_vec(percs, 5)
    for j, p in enumerate(percs):
        np.testing.assert_allclose(got[j], reference_pop_embed(p, 5), atol=1e-6)


def test_kcore_filter():
    rng = np.random.default_rng(0)
    users = rng.integers(0, 50, 2000)
    items = rng.integers(0, 40, 2000)
    keep = kcore_filter(users, items, k=5)
    u, i = users[keep], items[keep]
    assert np.bincount(i)[np.bincount(i) > 0].min() >= 5
    assert np.bincount(u)[np.bincount(u) > 0].min() >= 5


def test_popularity_table_matches_torch_flat_indexing():
    """The [T+nwin-1, bd, V+1] cube gather must equal the reference's
    zero-padded flat-table fancy indexing (model_utils.py:336-385)."""
    rng = np.random.default_rng(1)
    t, bd, v, nwin = 7, 3, 9, 4
    input_units = bd * nwin
    flat = rng.normal(size=(t * bd, v)).astype(np.float32)

    # reference emulation: pad (input-bd) zero rows on top, zero col left
    padded = np.concatenate([np.zeros((input_units - bd, v)), flat], axis=0)
    padded = np.concatenate([np.zeros((padded.shape[0], 1)), padded], axis=1)

    table = PopularityTable.from_flat(flat, bd, input_units)
    items = rng.integers(0, v + 1, size=(2, 5))
    times = rng.integers(0, t, size=(2, 5))
    got = np.asarray(table.gather(jnp.asarray(items), jnp.asarray(times)))

    for b in range(2):
        for s in range(5):
            rows = times[b, s] * bd + np.arange(input_units)
            want = padded[rows, items[b, s]]
            np.testing.assert_allclose(got[b, s], want, atol=1e-6)


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    """Synthetic raw interactions -> full preprocessing -> artifacts."""
    root = tmp_path_factory.mktemp("preprec_data")
    prefix = str(root / "synth")
    rng = np.random.default_rng(0)
    n = 6000
    users = rng.integers(0, 60, n)
    items = rng.integers(0, 50, n)
    base = 1_500_000_000
    times = base + rng.integers(0, 3600 * 24 * 366, n)  # ~1 year span
    stats = preprocess(items, users, times, prefix, t1_cutoff=30.0, t2_cutoff=7.0)
    eval_negatives(f"{prefix}_intwtime.csv", f"{prefix}_userneg.pickle", n=20, seed=0)
    week_adjustment(
        f"{prefix}_intwtime.csv", f"{prefix}_userneg.pickle",
        f"{prefix}_week_curr_raw.txt", f"{prefix}_week_wt_embed_adj.txt",
    )
    return prefix, stats


def test_preprocess_artifacts(synth_dataset):
    prefix, stats = synth_dataset
    for suffix in ("intwtime.csv", "int2.csv", "rawpop.txt", "wtembed.txt",
                   "week_embed2.txt", "week_curr_raw.txt", "userneg.pickle",
                   "week_wt_embed_adj.txt"):
        assert os.path.exists(f"{prefix}_{suffix}"), suffix
    rows = np.loadtxt(f"{prefix}_intwtime.csv", delimiter=",", dtype=np.int64)
    assert rows.shape[1] == 5
    # timestamps sorted
    assert (np.diff(rows[:, 4]) >= 0).all()
    wt = np.loadtxt(f"{prefix}_wtembed.txt")
    assert wt.shape[1] == stats["n_items"]
    assert wt.shape[0] % 11 == 0  # t1_size+1 rows per coarse bucket


def _make_cfg(prefix, model, maxlen=12, **kw):
    ds = load_intwtime(f"{prefix}_intwtime.csv", maxlen)
    wt = np.loadtxt(f"{prefix}_wtembed.txt")
    t1 = wt.shape[0] // 11
    wk = np.loadtxt(f"{prefix}_week_embed2.txt")
    cfg = PrepRecConfig(
        model=model, usernum=ds.usernum, itemnum=ds.itemnum, maxlen=maxlen,
        hidden_units=16, num_blocks=1, num_heads=1, dropout_rate=0.1,
        base_dim1=11, input_units1=33, base_dim2=6, input_units2=6,
        topk=(10, 5, 1), loss_size=max(ds.itemnum // 5, 1), **kw,
    )
    pop = PopularityEncoding.load(f"{prefix}_wtembed.txt", f"{prefix}_week_embed2.txt", cfg)
    negs = load_userneg(f"{prefix}_userneg.pickle", ds.usernum)
    return ds, cfg, pop, negs


def _logger():
    lg = logging.getLogger("preprec_test")
    lg.addHandler(logging.NullHandler())
    lg.propagate = False
    return lg


@pytest.mark.parametrize("model", ["newrec", "sasrec", "bert4rec", "newb4rec", "bprmf", "cl4srec"])
def test_model_trains_and_evals(model, synth_dataset, tmp_path):
    prefix, _ = synth_dataset
    kw = {"mask_prob": 0.3} if model in ("bert4rec", "newb4rec") else {}
    ds, cfg, pop, negs = _make_cfg(prefix, model, **kw)
    tcfg = PrepRecTrainConfig(batch_size=16, num_epochs=2, epoch_test=1, seed=1)
    trainer = PrepRecTrainer(
        cfg, tcfg, ds, _logger(), str(tmp_path / model),
        pop_enc=pop, usernegs=negs,
    )
    loss = trainer.train_epoch()
    assert np.isfinite(loss)
    metrics, ranks = trainer.evaluate("valid")
    assert len(metrics) == 3
    assert ranks.shape[0] == ds.usernum
    assert (ranks >= 0).all() and (ranks <= negs.shape[1]).all()


def test_newrec_learns_signal(synth_dataset, tmp_path):
    """A couple of epochs must beat the random-rank expectation."""
    prefix, _ = synth_dataset
    ds, cfg, pop, negs = _make_cfg(prefix, "newrec")
    tcfg = PrepRecTrainConfig(batch_size=16, num_epochs=6, epoch_test=6, stop_early=10, seed=2)
    trainer = PrepRecTrainer(cfg, tcfg, ds, _logger(), str(tmp_path / "m"), pop_enc=pop, usernegs=negs)
    for _ in range(4):
        loss = trainer.train_epoch()
    assert np.isfinite(loss)
    _, ranks = trainer.evaluate("valid")
    # mean rank over 21 candidates should differ from pure chance (10)
    assert 0 <= ranks.mean() <= 20


def test_quirk186_toggle_reproduces_reference_gather(synth_dataset, tmp_path, monkeypatch):
    """BSAREC_PREPREC_QUIRK186=1 must switch the trainer's pos/neg week
    popularity gather to the reference's bugged month-indexed form
    (`repo-b/model.py:181,186`) — used to attribute the head-to-head
    convergence gap (results/r5_runs/headtohead_preprec_plateau.md).
    Same seed: quirk changes the epoch loss; default path is unchanged."""
    prefix, _ = synth_dataset
    ds, cfg, pop, negs = _make_cfg(prefix, "newrec")
    tcfg = PrepRecTrainConfig(batch_size=16, num_epochs=1, epoch_test=1, seed=7)

    def one_epoch(tag):
        tr = PrepRecTrainer(cfg, tcfg, ds, _logger(), str(tmp_path / tag),
                            pop_enc=pop, usernegs=negs)
        return tr.train_epoch()

    base = one_epoch("a")
    again = one_epoch("b")
    assert base == again  # deterministic under fixed seed
    monkeypatch.setenv("BSAREC_PREPREC_QUIRK186", "1")
    quirk = one_epoch("c")
    assert np.isfinite(quirk) and quirk != base


def test_transfer_roundtrip(synth_dataset, tmp_path):
    """Zero-shot transfer: params trained on one domain load into a
    model built on different popularity tables (`repo-b/main.py:151-177`)."""
    prefix, _ = synth_dataset
    ds, cfg, pop, negs = _make_cfg(prefix, "newrec")
    tcfg = PrepRecTrainConfig(batch_size=16, num_epochs=1, epoch_test=1, seed=3)
    src = PrepRecTrainer(cfg, tcfg, ds, _logger(), str(tmp_path / "src"), pop_enc=pop, usernegs=negs)
    src.train_epoch()
    from bsarec_tpu.train.checkpoint import save_params
    save_params(src.params, tmp_path / "src" / "best.ckpt")

    tgt = PrepRecTrainer(cfg, tcfg, ds, _logger(), str(tmp_path / "tgt"), pop_enc=pop, usernegs=negs)
    tgt.load_transfer(str(tmp_path / "src" / "best.ckpt"))
    chex = jax.tree.map(lambda a, b: np.allclose(a, b), src.params, tgt.params)
    assert all(jax.tree.leaves(chex))
    metrics, _ = tgt.evaluate("valid")
    assert len(metrics) == 3


def test_cloze_mask_statistics():
    key = jax.random.PRNGKey(0)
    tokens = jnp.ones((64, 100), jnp.int32) * 7
    masked, labels = cloze_mask(key, tokens, itemnum=50, mask_prob=0.4)
    frac = float(jnp.mean(labels != 0))
    assert 0.3 < frac < 0.5  # ~mask_prob of positions selected
    sel = np.asarray(labels != 0)
    m = np.asarray(masked)[sel]
    assert (np.asarray(labels)[sel] == 7).all()
    # of selected: ~80% -> 0, ~10% random, ~10% unchanged
    assert 0.6 < (m == 0).mean() < 0.95
    # padding never masked
    pad = jnp.zeros((4, 10), jnp.int32)
    m2, l2 = cloze_mask(key, pad, 50, 0.9)
    assert (np.asarray(l2) == 0).all()


def test_newb4rec_candidates_gold_is_masked_input():
    """Reference-exact sampled-softmax candidates (`repo-b/model.py:
    382-390`): the appended gold column is the MASKED INPUT token — the
    reference's comment says "actual labels" but its code appends
    `seqs` — so after cloze masking the gold is usually the mask token,
    not the label."""
    from bsarec_tpu.preprec.sampler import newb4rec_candidates

    key = jax.random.PRNGKey(3)
    tokens = jnp.ones((32, 20), jnp.int32) * 9
    masked, labels = cloze_mask(key, tokens, itemnum=50, mask_prob=0.5)
    cands = np.asarray(newb4rec_candidates(jax.random.PRNGKey(4), masked, 50, 6))
    assert cands.shape == (32, 20, 7)
    np.testing.assert_array_equal(cands[..., -1], np.asarray(masked))
    # at supervised positions the gold differs from the label wherever
    # the cloze rule replaced the token (the 80%+10% branches)
    sel = np.asarray(labels != 0)
    assert (cands[..., -1][sel] != np.asarray(labels)[sel]).mean() > 0.5
    assert ((cands[..., :-1] >= 1) & (cands[..., :-1] <= 50)).all()


def test_permute_user_items():
    key = jax.random.PRNGKey(1)
    rows = jnp.asarray(np.array([[0, 0, 3, 5, 9], [0, 0, 0, 2, 4]], np.int32))
    out = np.asarray(permute_user_items(key, rows))
    assert sorted(out[0][out[0] > 0]) == [3, 5, 9]
    assert (out[0][3:] == 0).all() or (out[0][:3] > 0).all()  # zeros at tail
    assert sorted(out[1][out[1] > 0]) == [2, 4]


def test_augment_batch_preserves_shape():
    rng = np.random.default_rng(0)
    seqs = np.zeros((8, 10), np.int32)
    lens = np.zeros(8, np.int64)
    for i in range(8):
        n = rng.integers(3, 9)
        seqs[i, 10 - n :] = rng.integers(1, 20, n)
        lens[i] = n
    a1, a2 = augment_batch(rng, seqs, lens)
    assert a1.shape == seqs.shape and a2.shape == seqs.shape
    assert not (a1 == a2).all()  # different views (with high probability)


def test_score_export_and_ensembling(synth_dataset, tmp_path):
    """--save_scores / --use_scores semantics: raw [U, C] scores come
    back, and alpha-blended ranks reduce to plain ranks at alpha=1
    (`repo-b/utils.py:522,546-551`)."""
    from bsarec_tpu.preprec.evaluate import ensemble_ranks

    prefix, _ = synth_dataset
    ds, cfg, pop, negs = _make_cfg(prefix, "newrec")
    tcfg = PrepRecTrainConfig(batch_size=16, num_epochs=1, epoch_test=1, seed=5)
    tr = PrepRecTrainer(cfg, tcfg, ds, _logger(), str(tmp_path / "sc"), pop_enc=pop, usernegs=negs)
    tr.train_epoch()
    scores = tr.eval_scores("valid")
    assert scores.shape == (ds.usernum, negs.shape[1] + 1)
    assert np.isfinite(scores).all()

    # alpha=1 reproduces ranking on the fresh scores alone (no random
    # tie-break; scores are continuous so ties have measure zero)
    loaded = np.zeros_like(scores)
    (ranks_a1,) = ensemble_ranks(scores, loaded, [1.0])
    want = np.sum(scores > scores[:, :1], axis=1)
    np.testing.assert_array_equal(ranks_a1, want)
    # alpha=0 ranks purely by the loaded scores
    loaded = np.random.default_rng(0).normal(size=scores.shape)
    (ranks_a0,) = ensemble_ranks(scores, loaded, [0.0])
    np.testing.assert_array_equal(ranks_a0, np.sum(loaded > loaded[:, :1], axis=1))


def test_export_candidate_scorer_roundtrip(synth_dataset, tmp_path):
    """The AOT PREPRec serving artifact (params + popularity tables
    baked; `preprec/serving.py`) reproduces the in-process eval scores
    exactly, at any batch size, and its topk is the argsort of them."""
    from bsarec_tpu.preprec.evaluate import build_eval_inputs
    from bsarec_tpu.preprec.serving import (
        export_candidate_scorer,
        load_candidate_scorer,
    )

    prefix, _ = synth_dataset
    ds, cfg, pop, negs = _make_cfg(prefix, "newrec")
    tcfg = PrepRecTrainConfig(batch_size=16, num_epochs=1, epoch_test=1, seed=7)
    tr = PrepRecTrainer(cfg, tcfg, ds, _logger(), str(tmp_path / "srv"),
                        pop_enc=pop, usernegs=negs)
    tr.train_epoch()
    want = tr.eval_scores("valid")  # [U, C] via make_eval_fn

    inputs = build_eval_inputs(ds, cfg, "valid", negs)
    n_cands = inputs.cands.shape[1]
    # the serving contract takes [b, C] candidate times; EvalInputs
    # stores them as per-user columns (constant across candidates)
    ct1 = np.repeat(inputs.cand_t1[:, None], n_cands, axis=1)
    ct2 = np.repeat(inputs.cand_t2[:, None], n_cands, axis=1)
    path = str(tmp_path / "preprec_scorer.jaxexp")
    meta = export_candidate_scorer(
        tr.model, cfg, tr.params, pop, None,
        cfg.maxlen, n_cands, path)
    assert meta["bytes"] > 0 and meta["model"] == "newrec"

    scorer = load_candidate_scorer(path)
    assert scorer.seq_len == cfg.maxlen
    assert scorer.n_cands == n_cands
    got = scorer.scores(inputs.seqs, inputs.t1, inputs.t2, inputs.cands,
                        ct1, ct2, inputs.users)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # batch-polymorphic: a 3-row slice reuses the same artifact
    got3 = scorer.scores(inputs.seqs[:3], inputs.t1[:3], inputs.t2[:3],
                         inputs.cands[:3], ct1[:3], ct2[:3], inputs.users[:3])
    np.testing.assert_allclose(got3, want[:3], rtol=1e-5, atol=1e-5)
    top = scorer.topk(inputs.seqs[:3], inputs.t1[:3], inputs.t2[:3],
                      inputs.cands[:3], ct1[:3], ct2[:3], inputs.users[:3], k=5)
    np.testing.assert_array_equal(
        top, np.argsort(-got3, axis=1, kind="stable")[:, :5])


def test_mostpop_implicit_catalog_matches_explicit_loop():
    """The counting-based implicit full-catalog mostpop (order
    statistics + one Binomial tie draw; nothing of size [U, V] is
    built) matches the reference-shaped explicit scoring
    (`repo-b/utils.py:858-883`: [gt] + arange with rated items removed,
    random-key tie-break) exactly on the deterministic strictly-better
    count, within the tie bounds per draw, and in per-user mean over
    many seeds (the tie laws are identical: every tied candidate beats
    the ground truth iff its uniform draw exceeds the gt's single
    draw, i.e. Binomial(n_tied, 1-u_gt) wins conditional on u_gt)."""
    from bsarec_tpu.preprec.evaluate import EvalInputs, mostpop_ranks

    rng = np.random.default_rng(7)
    itemnum, users = 40, 16
    target = rng.integers(1, itemnum + 1, users).astype(np.int32)
    seqs = rng.integers(0, itemnum + 1, (users, 10)).astype(np.int32)
    zc = np.zeros(users, np.int32)
    inp = EvalInputs(
        seqs, np.zeros_like(seqs), np.zeros_like(seqs), np.zeros_like(seqs),
        target, None, zc, zc, np.arange(1, users + 1, dtype=np.int32), itemnum,
    )
    rawpop = np.round(rng.random(itemnum), 1)  # coarse values -> real ties

    # reference-shaped explicit competitor sets
    pop = np.concatenate([[0.0], rawpop])
    n_gt = np.zeros(users, int)
    n_tied = np.zeros(users, int)
    for u in range(users):
        rated = np.unique(seqs[u])
        rated = rated[rated > 0]
        comp = np.setdiff1d(np.arange(1, itemnum + 1), rated)
        n_gt[u] = int(np.sum(pop[comp] > pop[target[u]]))
        n_tied[u] = int(np.sum(pop[comp] == pop[target[u]]))

    def explicit_version(seed):
        r = np.random.default_rng(seed)
        out = np.zeros(users, int)
        for u in range(users):
            rated = np.unique(seqs[u])
            rated = rated[rated > 0]
            comp = np.setdiff1d(np.arange(1, itemnum + 1), rated)
            s = pop[comp]
            u_gt = r.random()
            u_c = r.random(s.size)
            out[u] = np.sum((s > pop[target[u]]) | ((s == pop[target[u]]) & (u_c > u_gt)))
        return out

    n_seeds = 400
    imp = np.stack([
        mostpop_ranks(inp, rawpop, np.random.default_rng(s), exclude_rated=True)
        for s in range(n_seeds)
    ])
    exp = np.stack([explicit_version(s) for s in range(n_seeds)])
    # deterministic part + bounds hold draw by draw
    assert (imp >= n_gt[None]).all() and (imp <= (n_gt + n_tied)[None]).all()
    assert (exp >= n_gt[None]).all() and (exp <= (n_gt + n_tied)[None]).all()
    # tie-free users rank identically every draw
    free = n_tied == 0
    np.testing.assert_array_equal(imp[:, free], np.broadcast_to(n_gt[free], (n_seeds, free.sum())))
    # per-user mean rank agrees (E = n_gt + n_tied/2, se <~ 0.1 here)
    np.testing.assert_allclose(imp.mean(0), exp.mean(0), atol=0.5)


def test_popularity_gather_lowers_without_catalog_sized_intermediate():
    """Compile-time scale pin (round-5 regression): the popularity
    gather must lower to a joint (period, item) gather whose
    intermediates are result-sized. The old period-then-item indexing
    (`table[window]` + take_along_axis) materialized
    [batch, cands, nwin, base_dim, V+1] — 12.3 GB at a 1M-item eval
    sweep, rejected by the TPU compiler's bounds check
    (`results/r5_runs/preprec_scale_1m_fixed.log`). Lower for a
    1M-item table (shapes only, no arrays) and assert no tensor type
    carries both the candidate-batch dims and the catalog dim."""
    import re

    v = 1_000_000
    table = PopularityTable(
        jax.ShapeDtypeStruct((7, 11, v + 1), jnp.float32), 11, 3)

    def gather(tbl, items, times):
        return PopularityTable(tbl, 11, 3).gather(items, times)

    lowered = jax.jit(gather).lower(
        table.table,
        jax.ShapeDtypeStruct((4, 64), jnp.int32),
        jax.ShapeDtypeStruct((4, 64), jnp.int32),
    )
    text = lowered.as_text()
    offenders = [
        t for t in re.findall(r"tensor<[0-9x]+x[a-z0-9]+>", text)
        if "1000001" in t and "4x64" in t
    ]
    assert not offenders, offenders
    # the result itself is tiny: [4, 64, 33]
    assert "tensor<4x64x33xf32>" in text


def test_full_catalog_eval_streaming_matches_explicit(synth_dataset, tmp_path):
    """eval_method 3 never materializes [U, V]: candidates are the
    implicit [gt] + arange sweep and the gt rank accumulates over
    `eval_item_chunk`-sized blocks (the TPU-native equivalent of
    `repo-b/utils.py:492-545`'s host chunking). Chunked scoring is
    bit-exact vs the monolithic candidate einsum, so streaming ranks
    must equal the explicit n_better count wherever scores are
    tie-free, sit within the tie bounds elsewhere, and the model's own
    `predict` must reproduce the swept score rows."""
    prefix, _ = synth_dataset
    ds, cfg, pop, _ = _make_cfg(prefix, "newrec", eval_method=3)
    # item_chunk smaller than the catalog forces multiple sweep chunks
    tcfg = PrepRecTrainConfig(batch_size=16, num_epochs=1, epoch_test=1,
                              seed=9, eval_batch_size=8, eval_item_chunk=16)
    tr = PrepRecTrainer(cfg, tcfg, ds, _logger(), str(tmp_path / "fc"),
                        pop_enc=pop, usernegs=None)
    tr.train_epoch()
    _, ranks = tr.evaluate("valid")
    scores = tr.eval_scores("valid")  # [U, V+1] via the same chunked sweep
    assert scores.shape == (ds.usernum, ds.itemnum + 1)
    assert np.isfinite(scores).all()

    n_better = (scores[:, 1:] > scores[:, :1]).sum(1)
    n_tied = (scores[:, 1:] == scores[:, :1]).sum(1)
    assert (ranks >= n_better).all() and (ranks <= n_better + n_tied).all()
    free = n_tied == 0
    assert free.any()  # the corpus must actually exercise the exact branch
    np.testing.assert_array_equal(ranks[free], n_better[free])

    # the factored final-state x cand-embed sweep equals model.predict
    from bsarec_tpu.preprec.evaluate import build_eval_inputs

    inputs = build_eval_inputs(ds, cfg, "valid", None)
    b = 4
    cands = np.concatenate(
        [inputs.target[:b, None],
         np.tile(np.arange(1, ds.itemnum + 1, dtype=np.int32), (b, 1))], axis=1)
    ct1 = np.repeat(inputs.cand_t1[:b, None], cands.shape[1], axis=1)
    ct2 = np.repeat(inputs.cand_t2[:b, None], cands.shape[1], axis=1)
    feats = pop(inputs.seqs[:b], inputs.t1[:b], inputs.t2[:b])
    cand_feats = pop(jnp.asarray(cands), jnp.asarray(ct1), jnp.asarray(ct2))
    direct = tr.model.apply(
        {"params": tr.params}, feats, inputs.seqs[:b] == 0, cand_feats,
        None, method="predict")
    np.testing.assert_allclose(np.asarray(direct), scores[:b], rtol=1e-5, atol=1e-5)


def test_user_embedding_export(synth_dataset, tmp_path):
    """`newrec_user` capability (`repo-b/utils.py:575-621`): per-user
    final encoder states, usable for cross-domain transfer analysis."""
    prefix, _ = synth_dataset
    ds, cfg, pop, negs = _make_cfg(prefix, "newrec")
    tcfg = PrepRecTrainConfig(batch_size=16, num_epochs=1, epoch_test=1, seed=6)
    tr = PrepRecTrainer(cfg, tcfg, ds, _logger(), str(tmp_path / "ue"), pop_enc=pop, usernegs=negs)
    tr.train_epoch()
    emb = tr.user_embeddings("valid")
    assert emb.shape == (ds.usernum, cfg.hidden_units)
    assert np.isfinite(emb).all()
    assert np.abs(emb).sum() > 0


def test_dual_dataset_training(synth_dataset, tmp_path):
    """Concurrent dual-dataset training (`repo-b/train_test.py:132-171`):
    the same parameters alternate between two datasets' batches."""
    prefix, _ = synth_dataset
    ds, cfg, pop, negs = _make_cfg(prefix, "newrec")
    tcfg = PrepRecTrainConfig(batch_size=16, num_epochs=2, epoch_test=2, stop_early=5, seed=7)
    t1 = PrepRecTrainer(cfg, tcfg, ds, _logger(), str(tmp_path / "d1"), pop_enc=pop, usernegs=negs)
    t2 = PrepRecTrainer(cfg, tcfg, ds, _logger(), str(tmp_path / "d2"), pop_enc=pop, usernegs=negs)
    before = jax.tree.leaves(t1.params)[0].copy()
    t1.fit(second=t2)
    # both trainers end on the identical (shared) parameters
    same = jax.tree.map(lambda a, b: np.allclose(a, b), t1.params, t2.params)
    assert all(jax.tree.leaves(same))
    assert not np.allclose(before, jax.tree.leaves(t1.params)[0])


def test_fs_emb_adapter_and_freeze(synth_dataset, tmp_path):
    """--fs_emb: the few-shot adapter exists, and after a transfer load
    only fs_layer trains (repo-b/main.py:164-170, model.py:43-49)."""
    prefix, _ = synth_dataset
    ds, cfg, pop, negs = _make_cfg(prefix, "newrec")
    tcfg = PrepRecTrainConfig(batch_size=16, num_epochs=1, epoch_test=1, seed=4)
    src = PrepRecTrainer(cfg, tcfg, ds, _logger(), str(tmp_path / "src"),
                         pop_enc=pop, usernegs=negs)
    src.train_epoch()
    from bsarec_tpu.train.checkpoint import save_params
    save_params(src.params, tmp_path / "src" / "best.ckpt")

    fs_cfg = cfg.replace(fs_emb=True)
    tgt = PrepRecTrainer(fs_cfg, tcfg, ds, _logger(), str(tmp_path / "tgt"),
                         pop_enc=pop, usernegs=negs)
    assert "fs_layer" in tgt.params
    tgt.load_transfer(str(tmp_path / "src" / "best.ckpt"))
    before = jax.tree.map(np.asarray, tgt.params)
    tgt.train_epoch()
    after = tgt.params
    for name in before:
        changed = not all(
            jax.tree.leaves(jax.tree.map(np.allclose, before[name], after[name]))
        )
        assert changed == (name == "fs_layer"), name


def test_sasrec_l2_emb_changes_loss(synth_dataset, tmp_path):
    prefix, _ = synth_dataset
    ds, cfg, pop, negs = _make_cfg(prefix, "sasrec")
    base = PrepRecTrainConfig(batch_size=16, num_epochs=1, epoch_test=1, seed=5)
    import dataclasses
    reg = dataclasses.replace(base, l2_emb=0.1)
    t0 = PrepRecTrainer(cfg, base, ds, _logger(), str(tmp_path / "a"), usernegs=negs)
    t1 = PrepRecTrainer(cfg, reg, ds, _logger(), str(tmp_path / "b"), usernegs=negs)
    l0, l1 = t0.train_epoch(), t1.train_epoch()
    emb = np.asarray(t0.params["item_emb"]["embedding"])
    assert l1 > l0  # the norm term is strictly positive
    assert l1 - l0 == pytest.approx(0.1 * np.linalg.norm(emb), rel=0.5)


def test_fit_train_only_and_state_override(synth_dataset, tmp_path):
    prefix, _ = synth_dataset
    ds, cfg, pop, negs = _make_cfg(prefix, "newrec")
    import dataclasses
    tcfg = PrepRecTrainConfig(
        batch_size=16, num_epochs=1, epoch_test=1, seed=6,
        train_only=True, first_eval=True,
    )
    t = PrepRecTrainer(cfg, tcfg, ds, _logger(), str(tmp_path / "t"),
                       pop_enc=pop, usernegs=negs)
    metrics, ranks = t.fit()
    assert metrics is None and ranks is None  # no final test ran

    so = dataclasses.replace(tcfg, train_only=False, state_override=True)
    t2 = PrepRecTrainer(cfg, so, ds, _logger(), str(tmp_path / "t2"),
                        pop_enc=pop, usernegs=negs)
    params_before_fit_end = t2.params
    metrics2, _ = t2.fit()
    assert metrics2 is not None


def test_preprec_cli_accepts_reference_flag_surface():
    """Every flag in repo-b/parse.py:3-86 parses (implemented, derived,
    or documented no-op) — the drop-in CLI contract."""
    from bsarec_tpu.preprec.main import parse

    argv = [
        "--dataset", "x/y", "--train_dir", "t", "--batch_size", "8",
        "--lr", "0.01", "--wd", "1e-5", "--maxlen", "16",
        "--hidden_units", "8", "--num_blocks", "1", "--num_epochs", "2",
        "--epoch_test", "1", "--stop_early", "2", "--num_heads", "1",
        "--dropout_rate", "0.1", "--l2_emb", "0.1", "--device", "cuda",
        "--train_only", "--inference_only", "--save_neg", "--first_eval",
        "--mode", "valid", "--prev_time", "--no_valid_in_test",
        "--state_dict_path", "p.ckpt", "--model", "newrec",
        "--monthpop", "wtembed", "--weekpop", "week_embed2",
        "--use_week_eval", "--week_eval_pop", "week_wt_embed_adj",
        "--rawpop", "rawpop", "--userpop", "lastuserpop",
        "--userneg", "userneg", "--base_dim1", "11",
        "--input_units1", "132", "--base_dim2", "6", "--input_units2", "6",
        "--mask_prob", "0.2", "--seed", "1", "--topk", "10", "5", "1",
        "--augment", "--augfulllen", "0", "--transfer", "--fs_transfer",
        "--fs_num_epochs", "3", "--fs_prop", "0.5", "--loss_size", "10",
        "--max_split_size", "128.0", "--no_emb", "--no_fixed_emb",
        "--eval_method", "3", "--eval_quality", "--quality_size", "20",
        "--triplet_loss", "--cos_loss", "--reg_file", "userhist",
        "--reg_num", "5", "--reg_coef", "0.5", "--only_reg",
        "--dataset2", "a/b", "--lag", "2", "--time_embed",
        "--time_no_fixed_embed", "--time_embed_concat", "--save_scores",
        "--use_scores", "--not_rank_scores", "--use_score_dir", "d",
        "--alphas", "0.3", "0.7", "--sparse", "--override_sparse",
        "--sparse_name", "sparse_", "--save_ranks", "--ranks_name", "r",
        "--save_emb", "--label", "z", "--fs_emb", "--time_df_mod", "_m",
        "--aug_coef", "0.2", "--state_override",
    ]
    args = parse(argv)
    assert args.l2_emb == 0.1 and args.fs_num_epochs == 3
    assert args.export_user_embed  # --save_emb alias
    assert args.sparse_name == "sparse_" and args.time_df_mod == "_m"


def test_init_scheme_matches_reference_effective(monkeypatch):
    """repo-b's init loop (`main.py:126-135`) xavier_normal_-s every
    parameter inside a bare try/except; xavier raises on <2-D tensors,
    so the EFFECTIVE scheme is: >=2-D params ~ N(0, 2/(fan_in+fan_out)),
    1-D params keep module defaults. Our default must reproduce that;
    BSAREC_PREPREC_INIT=torch restores plain torch defaults (the r4
    ablation arm)."""
    from bsarec_tpu.preprec.models import SASRecB

    cfg = PrepRecConfig(model="sasrec", usernum=8, itemnum=200, maxlen=16,
                        hidden_units=64, num_blocks=1, num_heads=1,
                        dropout_rate=0.0)
    ids = jnp.ones((2, 16), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}

    monkeypatch.setenv("BSAREC_PREPREC_INIT", "xavier")
    p = SASRecB(cfg).init(rngs, ids, ids, ids, train=False)["params"]
    table = np.asarray(p["item_emb"]["embedding"])
    # xavier_normal over [201, 64]: std = sqrt(2/265) ~= 0.0869
    want = np.sqrt(2.0 / (201 + 64))
    assert abs(table[1:].std() - want) / want < 0.05
    assert (table[0] == 0).all()  # padding row
    qw = np.asarray(p["backbone"]["attn_0"]["Q_w"]["kernel"])
    want_q = np.sqrt(2.0 / (64 + 64))
    assert abs(qw.std() - want_q) / want_q < 0.1
    # biases keep the torch Linear default U(+-1/sqrt(fan_in))
    qb = np.asarray(p["backbone"]["attn_0"]["Q_w"]["bias"])
    assert np.abs(qb).max() <= 1 / np.sqrt(64) + 1e-6

    monkeypatch.setenv("BSAREC_PREPREC_INIT", "torch")
    p2 = SASRecB(cfg).init(rngs, ids, ids, ids, train=False)["params"]
    t2 = np.asarray(p2["item_emb"]["embedding"])
    assert abs(t2[1:].std() - 1.0) < 0.05  # N(0,1) embeddings
    q2 = np.asarray(p2["backbone"]["attn_0"]["Q_w"]["kernel"])
    bound = 1 / np.sqrt(64)
    assert np.abs(q2).max() <= bound + 1e-6  # kaiming-uniform kernels
