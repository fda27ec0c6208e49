"""Torch cross-parity for the PREPRec (repo-b) zoo (VERDICT r2 #1).

Loads the mounted reference modules (`/root/reference/repo-b/model.py`
+ `model_utils.py`) via importlib, builds each torch model with its own
random init against synthetic popularity tables (dropout 0), ports the
live state_dict through `preprec/torch_import.py`, and asserts
forward/loss equality at fp32.

Reference quirks pinned explicitly as divergences:
- `model.py:186` — NewRec's pos/neg popularity gather passes
  `time1_seqs[:,1:]` as BOTH month and week periods when
  `prev_time=False` (week table indexed by month buckets); we index the
  week table with week buckets.
- `model.py:353` — NewB4Rec with fixed positional encodings OVERWRITES
  the embedded sequence with the positional table (`seqs =
  self.position_enc(seqs)`), discarding all popularity input; we add.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bsarec_tpu.preprec.config import PrepRecConfig  # noqa: E402
from bsarec_tpu.preprec.models import PREPREC_REGISTRY  # noqa: E402
from bsarec_tpu.preprec.popularity import (  # noqa: E402
    EvalPopularity,
    PopularityEncoding,
)
from bsarec_tpu.preprec.torch_import import import_preprec_torch  # noqa: E402

REPOB = "/root/reference/repo-b"

# small but structured: 3-month window x 4 dims, 1-group week x 3 dims
B, L, H, V, U = 5, 12, 16, 40, 20
BD1, IN1, BD2, IN2 = 4, 12, 3, 3
T1 = T2 = 8  # time periods in the synthetic tables (equal: see case A)
NC = 7  # eval candidates per user


@pytest.fixture(scope="module")
def repob():
    """Load repo-b model.py under non-clashing module names."""
    spec_u = importlib.util.spec_from_file_location(
        "repob_model_utils", f"{REPOB}/model_utils.py"
    )
    mu = importlib.util.module_from_spec(spec_u)
    sys.modules["model_utils"] = mu  # model.py does `from model_utils import *`
    sys.modules["repob_model_utils"] = mu
    spec_u.loader.exec_module(mu)
    spec_m = importlib.util.spec_from_file_location("repob_model", f"{REPOB}/model.py")
    mm = importlib.util.module_from_spec(spec_m)
    spec_m.loader.exec_module(mm)
    return types.SimpleNamespace(model=mm, utils=mu)


@pytest.fixture(scope="module")
def popdata(tmp_path_factory):
    """Synthetic popularity tables written where the reference expects
    them (`./data/{dataset}_{name}.txt`, `model_utils.py:308-312`)."""
    root = tmp_path_factory.mktemp("repob_data")
    (root / "data").mkdir()
    rng = np.random.default_rng(42)
    month = rng.random((T1 * BD1, V)).astype(np.float64)
    week = rng.random((T2 * BD2, V)).astype(np.float64)
    # the reference hardcodes base_dim2=6 in EvalPopularityEncoding's
    # reshape (`model_utils.py:473`): the eval-pop test needs 6-dim
    # week tables (dataset name "syn6") while the rest use BD2=3
    week6 = rng.random((T2 * 6, V)).astype(np.float64)
    week_eval6 = rng.random((U * 6, NC)).astype(np.float64)
    np.savetxt(root / "data" / "syn_wtembed.txt", month)
    np.savetxt(root / "data" / "syn_week_embed2.txt", week)
    np.savetxt(root / "data" / "syn6_wtembed.txt", month)
    np.savetxt(root / "data" / "syn6_week_embed2.txt", week6)
    np.savetxt(root / "data" / "syn6_week_wt_embed_adj.txt", week_eval6)
    return types.SimpleNamespace(
        root=root, month=month.astype(np.float32), week=week.astype(np.float32),
        week_eval6=week_eval6.astype(np.float32),
    )


def _args(**over):
    from argparse import Namespace

    base = dict(
        dataset="syn", dataset2="", device="cpu", model="newrec",
        maxlen=L, hidden_units=H, num_blocks=2, num_heads=1,
        dropout_rate=0.0, monthpop="wtembed", weekpop="week_embed2",
        week_eval_pop="week_wt_embed_adj", base_dim1=BD1, input_units1=IN1,
        base_dim2=BD2, input_units2=IN2, no_emb=False, no_fixed_emb=False,
        prev_time=False, lag=1, time_embed=False, time_no_fixed_embed=False,
        time_embed_concat=False, use_week_eval=False, fs_emb=False,
        triplet_loss=False, cos_loss=False, pause=False, batch_size=B,
    )
    base.update(over)
    return Namespace(**base)


def _cfg(**over):
    base = dict(
        model="newrec", usernum=U, itemnum=V, maxlen=L, hidden_units=H,
        num_blocks=2, num_heads=1, dropout_rate=0.0, base_dim1=BD1,
        input_units1=IN1, base_dim2=BD2, input_units2=IN2, lag=1,
    )
    base.update(over)
    return PrepRecConfig(**base)


def _my_pop(popdata):
    cfg = _cfg()
    from bsarec_tpu.preprec.popularity import PopularityTable

    return PopularityEncoding(
        PopularityTable.from_flat(popdata.month, BD1, IN1),
        PopularityTable.from_flat(popdata.week, BD2, IN2),
    )


def _batch(seed=0, t2_equals_t1=True):
    rng = np.random.default_rng(seed)
    rows = np.zeros((B, L + 1), np.int64)
    for i in range(B):
        n = rng.integers(3, L + 1)
        rows[i, L + 1 - n:] = rng.integers(1, V + 1, size=n)
    t1 = rng.integers(1, T1, size=(B, L + 1))
    t1.sort(axis=1)
    t2 = t1.copy() if t2_equals_t1 else np.sort(rng.integers(1, T2, size=(B, L + 1)), axis=1)
    neg = rng.integers(1, V + 1, size=(B, L))
    users = rng.integers(1, U + 1, size=B)
    return rows, t1, t2, neg, users


def _nsd(model):
    return {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}


def _jx(a, dt=jnp.int32):
    return jnp.asarray(np.asarray(a), dt)


def _masked_bce(pos_l, neg_l, valid):
    """The reference loss (`train_test.py:117-122`): BCEWithLogits over
    pos != 0 indices, pos and neg terms summed."""
    import jax.nn as jnn

    denom = np.maximum(valid.sum(), 1.0)
    pos = np.sum(np.asarray(jnn.softplus(-_jx(pos_l, jnp.float32))) * valid) / denom
    neg = np.sum(np.asarray(jnn.softplus(_jx(neg_l, jnp.float32))) * valid) / denom
    return pos + neg


# --------------------------------------------------------------------------


def _patch_popenc_default(repob, monkeypatch):
    """Latent reference bug: `NewB4Rec.__init__` calls
    `PopularityEncoding(args)` but `second` has no default
    (`model.py:284`, `model_utils.py:298`) — NewB4Rec is unconstructable
    in the reference as shipped. Give `second` a False default so the
    rest of the module can be parity-tested."""
    orig = repob.utils.PopularityEncoding

    def patched(args, second=False):
        return orig(args, second)

    # only in the model namespace (where NewB4Rec resolves the name);
    # the class itself stays put so its `super(PopularityEncoding, ...)`
    # name lookup keeps working
    monkeypatch.setattr(repob.model, "PopularityEncoding", patched)


def test_popularity_encoding_matches_torch(repob, popdata, monkeypatch):
    monkeypatch.chdir(popdata.root)
    torch.manual_seed(0)
    tenc = repob.utils.PopularityEncoding(_args(), second=False)
    mine = _my_pop(popdata)

    rows, t1, t2, _, _ = _batch(1, t2_equals_t1=False)
    seq = rows[:, :-1]
    want = np.asarray(tenc(seq, t1[:, :-1], t2[:, :-1]))
    got = np.asarray(mine(_jx(seq), _jx(t1[:, :-1]), _jx(t2[:, :-1])))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_eval_popularity_matches_torch(repob, popdata, monkeypatch):
    monkeypatch.chdir(popdata.root)
    tenc = repob.utils.EvalPopularityEncoding(
        _args(dataset="syn6", base_dim2=6, input_units2=6)
    )
    from bsarec_tpu.preprec.popularity import PopularityTable

    mine = EvalPopularity(
        PopularityTable.from_flat(popdata.month, BD1, IN1),
        jnp.asarray(
            popdata.week_eval6.reshape(U, 6, NC).swapaxes(1, 2)
        ),
        6,
    )
    rng = np.random.default_rng(3)
    cands = rng.integers(1, V + 1, size=(B, NC))
    ct1 = np.tile(rng.integers(1, T1, size=(B, 1)), (1, NC))
    users = rng.integers(1, U + 1, size=B)
    want = np.asarray(tenc(cands, ct1, None, torch.from_numpy(users)))
    got = np.asarray(mine(_jx(cands), _jx(ct1), _jx(users)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def _newrec_my_logits(params, pop, rows, t1, t2, neg, cfg, m2_from_t1=False):
    """Mirror of the trainer's feature path (`preprec/train.py:146-158`)."""
    t1s = np.maximum(0, t1 - 1 - cfg.lag // 4)
    t2s = np.maximum(0, t2 - cfg.lag)
    seq, pos = rows[:, :-1], rows[:, 1:]
    seq_feats = pop(_jx(seq), _jx(t1s[:, :-1]), _jx(t2s[:, :-1]))
    if cfg.prev_time:
        m1, m2 = t1s[:, :-1], t2s[:, :-1]
    else:
        m1, m2 = t1s[:, 1:], t2s[:, 1:]
    if m2_from_t1:  # reproduce the reference's model.py:186 quirk
        m2 = t1s[:, 1:]
    pos_feats = pop(_jx(pos), _jx(m1), _jx(m2))
    neg_feats = pop(_jx(neg), _jx(m1), _jx(m2))
    model = PREPREC_REGISTRY["newrec"](cfg)
    pos_l, neg_l, _ = model.apply(
        {"params": params}, seq_feats, _jx(seq) == 0, pos_feats, neg_feats,
        None, train=True, rngs={"dropout": jax.random.PRNGKey(0)},
    )
    return np.asarray(pos_l), np.asarray(neg_l), pos


def test_newrec_forward_and_loss_match_torch(repob, popdata, monkeypatch):
    """Case A: t2 == t1 and lag=1 make the reference's model.py:186
    quirk invisible — full forward + BCE loss parity."""
    monkeypatch.chdir(popdata.root)
    torch.manual_seed(4)
    tm = repob.model.NewRec(U, V, _args())
    params = import_preprec_torch("newrec", _nsd(tm), 2)
    cfg = _cfg()

    rows, t1, t2, neg, users = _batch(5, t2_equals_t1=True)
    tm.eval()
    with torch.no_grad():
        tpos, tneg, _, _, _ = tm(
            users, rows[:, :-1], t1, t2, None, rows[:, 1:], neg,
            np.array([], dtype=np.int64), np.array([], dtype=np.int64),
        )
    mpos, mneg, pos = _newrec_my_logits(params, _my_pop(popdata), rows, t1, t2, neg, cfg)
    np.testing.assert_allclose(mpos, np.asarray(tpos), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(mneg, np.asarray(tneg), rtol=2e-5, atol=2e-5)

    valid = (pos != 0).astype(np.float32)
    want = float(
        torch.nn.BCEWithLogitsLoss()(tpos[pos != 0], torch.ones_like(tpos[pos != 0]))
        + torch.nn.BCEWithLogitsLoss()(tneg[pos != 0], torch.zeros_like(tneg[pos != 0]))
    )
    got = _masked_bce(mpos, mneg, valid)
    assert abs(got - want) < 2e-5


def test_newrec_mod_time2_quirk_pinned(repob, popdata, monkeypatch):
    """Case B (t2 != t1): the reference gathers pos/neg WEEK popularity
    with MONTH periods (`model.py:186`). Our t2-based gather must
    diverge from the reference, and reproducing the quirk (m2 := t1)
    must restore exact agreement."""
    monkeypatch.chdir(popdata.root)
    torch.manual_seed(6)
    tm = repob.model.NewRec(U, V, _args())
    params = import_preprec_torch("newrec", _nsd(tm), 2)
    cfg = _cfg()

    rows, t1, t2, neg, users = _batch(7, t2_equals_t1=False)
    tm.eval()
    with torch.no_grad():
        tpos, _, _, _, _ = tm(
            users, rows[:, :-1], t1, t2, None, rows[:, 1:], neg,
            np.array([], dtype=np.int64), np.array([], dtype=np.int64),
        )
    pop = _my_pop(popdata)
    quirk_pos, _, _ = _newrec_my_logits(params, pop, rows, t1, t2, neg, cfg, m2_from_t1=True)
    ours_pos, _, _ = _newrec_my_logits(params, pop, rows, t1, t2, neg, cfg)
    np.testing.assert_allclose(quirk_pos, np.asarray(tpos), rtol=2e-5, atol=2e-5)
    assert np.max(np.abs(ours_pos - np.asarray(tpos))) > 1e-4  # genuine divergence


def test_sasrec_b_forward_matches_torch(repob):
    torch.manual_seed(8)
    tm = repob.model.SASRec(U, V, _args(model="sasrec"))
    params = import_preprec_torch("sasrec", _nsd(tm), 2)
    cfg = _cfg(model="sasrec")

    rows, _, _, neg, _ = _batch(9)
    seq, pos = rows[:, :-1], rows[:, 1:]
    tm.eval()
    with torch.no_grad():
        tpos, tneg = tm(seq, pos, neg)
        tpred = tm.predict(seq, np.tile(np.arange(1, NC + 1), (B, 1)))
    model = PREPREC_REGISTRY["sasrec"](cfg)
    mpos, mneg = model.apply(
        {"params": params}, _jx(seq), _jx(pos), _jx(neg), train=True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(np.asarray(mpos), np.asarray(tpos), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mneg), np.asarray(tneg), rtol=2e-5, atol=2e-5)
    mpred = model.apply(
        {"params": params}, _jx(seq), _jx(np.tile(np.arange(1, NC + 1), (B, 1))),
        method="predict",
    )
    np.testing.assert_allclose(np.asarray(mpred), np.asarray(tpred), rtol=2e-5, atol=2e-5)


def test_bert4rec_b_forward_matches_torch(repob):
    torch.manual_seed(10)
    tm = repob.model.BERT4Rec(V, _args(model="bert4rec", num_heads=2))
    params = import_preprec_torch("bert4rec", _nsd(tm), 2)
    cfg = _cfg(model="bert4rec", num_heads=2)

    rows, _, _, _, _ = _batch(11)
    seq = rows[:, :-1]
    tm.eval()
    with torch.no_grad():
        tlogits = tm(torch.from_numpy(seq))  # [B*T, V+1]
    model = PREPREC_REGISTRY["bert4rec"](cfg)
    mlogits = model.apply({"params": params}, _jx(seq), train=False)
    np.testing.assert_allclose(
        np.asarray(mlogits).reshape(-1, V + 1), np.asarray(tlogits),
        rtol=2e-5, atol=2e-5,
    )


def test_newb4rec_forward_matches_torch(repob, popdata, monkeypatch):
    """no_fixed_emb=True (learnable positions): the additive path both
    sides implement. Sampled-candidate loss checked by regenerating the
    reference's np.random.choice draw."""
    monkeypatch.chdir(popdata.root)
    _patch_popenc_default(repob, monkeypatch)
    torch.manual_seed(12)
    compare = 6
    targs = _args(model="newb4rec", no_fixed_emb=True, num_heads=2)
    tm = repob.model.NewB4Rec(V, compare, targs)
    params = import_preprec_torch("newb4rec", _nsd(tm), 2)
    cfg = _cfg(model="newb4rec", no_fixed_emb=True, num_heads=2, loss_size=compare)

    rows, t1, t2, _, _ = _batch(13)
    seq = rows[:, :-1]
    t1s, t2s = t1[:, :-1], t2[:, :-1]
    tm.eval()
    np.random.seed(99)
    with torch.no_grad():
        tlogp = tm(seq, t1s, t2s)  # [B*T, compare+1] log-softmax
    # regenerate the same candidate draw (model.py:382-391)
    np.random.seed(99)
    items = np.append(
        np.random.choice(np.arange(1, V + 1), size=(B, L, compare)),
        np.expand_dims(seq, axis=-1), axis=2,
    )
    t1c = np.tile(np.expand_dims(t1s, -1), (1, 1, compare + 1))
    t2c = np.tile(np.expand_dims(t2s, -1), (1, 1, compare + 1))
    pop = _my_pop(popdata)
    seq_feats = pop(_jx(seq), _jx(t1s), _jx(t2s))
    cand_feats = pop(_jx(items), _jx(t1c), _jx(t2c))
    model = PREPREC_REGISTRY["newb4rec"](cfg)
    mlogits = model.apply(
        {"params": params}, seq_feats, _jx(seq) > 0, cand_feats, train=False,
    )  # raw [B, T, C]
    # the reference applies LogSoftmax(dim=1) — the TIME axis of the
    # [B, T, C] tensor (`model.py:295,398`) — before flattening; the
    # trainer reproduces the same quirk (preprec/train.py newb4rec_loss)
    x = np.asarray(mlogits - jax.nn.logsumexp(mlogits, axis=1, keepdims=True))
    np.testing.assert_allclose(
        x.reshape(-1, compare + 1), np.asarray(tlogp), rtol=3e-5, atol=3e-5
    )


def test_newb4rec_fixed_emb_overwrite_quirk(repob, popdata, monkeypatch):
    """`model.py:353`: with fixed encodings the reference OVERWRITES the
    embedded sequence with the positional table (`seqs =
    self.position_enc(seqs)` — an apparent typo for `+=`). The
    positional table is [1, T, H], so the batch dimension collapses and
    the residual add crashes for B > 1 — the reference's fixed-emb
    NewB4Rec path is unrunnable as shipped. We implement the additive
    behavior (documented divergence, `preprec/models.py` docstring) and
    our path must genuinely depend on the popularity input."""
    monkeypatch.chdir(popdata.root)
    _patch_popenc_default(repob, monkeypatch)
    torch.manual_seed(14)
    tm = repob.model.NewB4Rec(V, 6, _args(model="newb4rec", no_fixed_emb=False))
    rows, t1, t2, _, _ = _batch(15)
    rows2 = np.where(rows > 0, (rows % V) + 1, 0)  # different items
    tm.eval()
    with torch.no_grad(), pytest.raises(RuntimeError):
        tm.log2feats(rows[:, :-1], t1[:, :-1], t2[:, :-1])

    params = import_preprec_torch("newb4rec", _nsd(tm), 2)
    cfg = _cfg(model="newb4rec", no_fixed_emb=False)
    pop = _my_pop(popdata)
    model = PREPREC_REGISTRY["newb4rec"](cfg)

    def enc(r):
        feats = pop(_jx(r[:, :-1]), _jx(t1[:, :-1]), _jx(t2[:, :-1]))
        return np.asarray(
            model.apply({"params": params}, feats, _jx(r[:, :-1]) > 0, method="encode")
        )

    assert np.max(np.abs(enc(rows) - enc(rows2))) > 1e-4  # ours uses the input


def test_bprmf_matches_torch(repob):
    torch.manual_seed(16)
    tm = repob.model.BPRMF(U, V, _args(model="bprmf"))
    params = import_preprec_torch("bprmf", _nsd(tm), 0)
    cfg = _cfg(model="bprmf")

    rng = np.random.default_rng(17)
    users = rng.integers(1, U + 1, size=B)
    pos = rng.integers(1, V + 1, size=(B, L))
    neg = rng.integers(1, V + 1, size=(B, L))
    tm.eval()
    with torch.no_grad():
        tpos, tneg = tm(users, pos, neg)
    model = PREPREC_REGISTRY["bprmf"](cfg)
    mpos, mneg = model.apply({"params": params}, _jx(users), _jx(pos), _jx(neg))
    np.testing.assert_allclose(np.asarray(mpos), np.asarray(tpos), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mneg), np.asarray(tneg), rtol=2e-5, atol=2e-5)


def test_cl4srec_encode_and_info_nce_match_torch(repob):
    """Augmentations are random inside the reference's forward; the
    deterministic pieces — the shared SASRec tower and the InfoNCE given
    fixed views — are compared directly."""
    torch.manual_seed(18)
    tm = repob.model.CL4SRec(V, _args(model="cl4srec"))
    params = import_preprec_torch("cl4srec", _nsd(tm), 2)
    cfg = _cfg(model="cl4srec")

    rows, _, _, neg, _ = _batch(19)
    seq, pos = rows[:, :-1], rows[:, 1:]
    tm.eval()
    with torch.no_grad():
        tfeats = tm.log2feats(seq)
        tpos = (tfeats * tm.item_emb(torch.from_numpy(pos))).sum(-1)
        z1 = torch.randn(B, H)
        z2 = torch.randn(B, H)
        tnce = float(tm.info_nce(z1, z2, B, temp=1, sim="dot"))
    model = PREPREC_REGISTRY["cl4srec"](cfg)
    mfeats = model.apply({"params": params}, _jx(seq), method="encode")
    np.testing.assert_allclose(np.asarray(mfeats), np.asarray(tfeats), rtol=2e-5, atol=2e-5)
    mpos = np.sum(
        np.asarray(mfeats)
        * tm.item_emb(torch.from_numpy(pos)).detach().numpy(),
        -1,
    )
    np.testing.assert_allclose(mpos, np.asarray(tpos), rtol=2e-5, atol=2e-5)

    from bsarec_tpu.ops.losses import info_nce_logits

    mnce = float(info_nce_logits(
        jnp.asarray(z1.numpy()), jnp.asarray(z2.numpy()), 1.0, "dot"
    ))
    assert abs(mnce - tnce) < 2e-6
