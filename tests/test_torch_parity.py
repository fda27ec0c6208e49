"""Torch cross-parity: random reference weights -> our Flax trees ->
forward/loss equality at fp32 (VERDICT r2 missing #1).

The golden-checkpoint tests (`test_torch_import.py`) pin bsarec (and,
by shared-module coverage, sasrec/bert4rec/fmlprec) against the shipped
`.pt`s; the models below had no numerical cross-check against the
reference implementation until now. Here we import the MOUNTED
reference modules (`/root/reference/src`), build each torch model with
its own random init (dropout 0), port the live state_dict through
`train/torch_import.py`, and assert forward outputs and training-loss
values agree to fp32 tolerance.

Reference entry points exercised: `src/model/caser.py:86-153`,
`src/model/gru4rec.py:41-67`, `src/model/duorec.py:80-127`,
`src/model/fearec.py:80-145,310-413`, plus `sasrec.py`/`bsarec.py`/
`fmlprec.py` forwards for completeness.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

SRC = "/root/reference/src"
if SRC not in sys.path:
    sys.path.insert(0, SRC)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bsarec_tpu.config import ModelConfig  # noqa: E402
from bsarec_tpu.models import build_model  # noqa: E402
from bsarec_tpu.train.torch_import import import_torch_checkpoint  # noqa: E402

B, L, H, V, U = 6, 50, 32, 201, 31


def _args(**over):
    from argparse import Namespace

    base = dict(
        item_size=V, num_users=U, max_seq_length=L, hidden_size=H,
        num_hidden_layers=2, num_attention_heads=2, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        initializer_range=0.02, batch_size=B,
    )
    base.update(over)
    return Namespace(**base)


def _cfg(model_type, **over):
    base = dict(
        model_type=model_type, item_size=V, num_users=U, max_seq_length=L,
        hidden_size=H, num_hidden_layers=2, num_attention_heads=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    base.update(over)
    return ModelConfig(**base)


def _batch(seed=0, zero_answer=False):
    rng = np.random.default_rng(seed)
    inputs = np.zeros((B, L), np.int64)
    for i in range(B):
        n = rng.integers(3, L)
        inputs[i, L - n:] = rng.integers(1, V, size=n)
    answers = rng.integers(1, V, size=B)
    if zero_answer:
        answers[0] = 0  # exercises the pos_ids != 0 masking
    negs = rng.integers(1, V, size=B)
    sem = np.roll(inputs, 1, axis=0)  # any same-shaped id batch works
    users = rng.integers(1, U, size=B)
    return inputs, answers, negs, sem, users


def _numpy_sd(model):
    return {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}


def _jx(a):
    return jnp.asarray(np.asarray(a, np.int32))


def _torch_forward(model, inputs, users):
    model.eval()
    with torch.no_grad():
        out = model.forward(torch.from_numpy(inputs), torch.from_numpy(users))
    return np.asarray(out)


def _torch_loss(model, batch):
    inputs, answers, negs, sem, users = (torch.from_numpy(x) for x in batch)
    model.train()
    with torch.no_grad():
        loss = model.calculate_loss(inputs, answers, negs, sem, users)
    return float(loss)


def _our_forward(cfg, params, inputs, users):
    model = build_model(cfg)
    return np.asarray(
        model.apply({"params": params}, _jx(inputs), _jx(users), train=False)
    )


def _our_loss(cfg, params, batch):
    inputs, answers, negs, sem, users = batch
    model = build_model(cfg)
    return float(
        model.apply(
            {"params": params}, _jx(inputs), _jx(answers), _jx(negs),
            _jx(sem), _jx(users), train=True, method="calculate_loss",
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
    )


# --------------------------------------------------------------------------


def test_caser_forward_and_loss_match_torch():
    from model.caser import CaserModel as TorchCaser

    torch.manual_seed(0)
    tm = TorchCaser(_args(nh=4, nv=3, reg_weight=1e-4))
    params = import_torch_checkpoint("caser", _numpy_sd(tm), L)
    cfg = _cfg("caser", nh=4, nv=3, reg_weight=1e-4)

    batch = _batch(1, zero_answer=True)
    inputs, answers, negs, sem, users = batch
    want = _torch_forward(tm, inputs, users)
    got = _our_forward(cfg, params, inputs, users)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert abs(_our_loss(cfg, params, batch) - _torch_loss(tm, batch)) < 2e-5


def test_gru4rec_forward_and_loss_match_torch():
    from model.gru4rec import GRU4RecModel as TorchGRU

    torch.manual_seed(1)
    tm = TorchGRU(_args(gru_hidden_size=H))
    params = import_torch_checkpoint("gru4rec", _numpy_sd(tm), 2)
    cfg = _cfg("gru4rec", gru_hidden_size=H)

    batch = _batch(2)
    inputs, answers, negs, sem, users = batch
    want = _torch_forward(tm, inputs, users)
    got = _our_forward(cfg, params, inputs, users)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert abs(_our_loss(cfg, params, batch) - _torch_loss(tm, batch)) < 2e-5


def test_duorec_forward_and_loss_match_torch():
    from model.duorec import DuoRecModel as TorchDuoRec

    torch.manual_seed(2)
    tm = TorchDuoRec(_args(tau=1.0, lmd=0.1, lmd_sem=0.1, ssl="us_x", sim="dot"))
    params = import_torch_checkpoint("duorec", _numpy_sd(tm), 2)
    cfg = _cfg("duorec")

    batch = _batch(3)
    inputs, answers, negs, sem, users = batch
    want = _torch_forward(tm, inputs, users)
    got = _our_forward(cfg, params, inputs, users)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # dropout 0 -> both sides' "views" coincide; the InfoNCE term (our
    # algebraic form vs the reference's concat-positive-column CE) and
    # the full-vocab CE must still agree exactly
    assert abs(_our_loss(cfg, params, batch) - _torch_loss(tm, batch)) < 2e-5


@pytest.mark.parametrize("sim", ["dot", "cos"])
def test_duorec_info_nce_matches_torch(sim):
    """Distinct views (the shapes dropout would give): our in-batch
    InfoNCE vs the reference's concat-column construction."""
    from model.duorec import DuoRecModel as TorchDuoRec

    from bsarec_tpu.ops.losses import info_nce_logits

    torch.manual_seed(3)
    tm = TorchDuoRec(_args(tau=0.7, lmd=0.1, lmd_sem=0.1, ssl="us_x", sim=sim))
    rng = np.random.default_rng(4)
    z_i = rng.normal(size=(B, L, H)).astype(np.float32)
    z_j = rng.normal(size=(B, L, H)).astype(np.float32)
    logits, labels = tm.info_nce(
        torch.from_numpy(z_i), torch.from_numpy(z_j), 0.7, B, sim=sim
    )
    want = float(torch.nn.CrossEntropyLoss()(logits, labels))
    got = float(
        info_nce_logits(jnp.asarray(z_i[:, -1]), jnp.asarray(z_j[:, -1]), 0.7, sim)
    )
    assert abs(got - want) < 2e-6


def test_fearec_forward_and_loss_match_torch():
    """The most intricate reference module (`fearec.py:229-413`): band
    windows, autocorrelation delay aggregation (train AND inference
    variants), dual-domain attention, fredom regularization."""
    from model.fearec import FEARecModel as TorchFEARec

    torch.manual_seed(5)
    tm = TorchFEARec(_args(
        tau=1.0, lmd=0.1, lmd_sem=0.1, ssl="us_x", sim="dot",
        spatial_ratio=0.1, global_ratio=0.6, fredom="True", fredom_type="us_x",
    ))
    params = import_torch_checkpoint("fearec", _numpy_sd(tm), 2)
    cfg = _cfg("fearec")

    batch = _batch(6)
    inputs, answers, negs, sem, users = batch
    # eval-mode forward: inference delay agg (per-row top-k)
    want = _torch_forward(tm, inputs, users)
    got = _our_forward(cfg, params, inputs, users)
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)
    # train-mode loss: training delay agg (batch-shared top-k) + CE +
    # InfoNCE + time-axis ortho fredom on the full sequence outputs
    assert abs(_our_loss(cfg, params, batch) - _torch_loss(tm, batch)) < 5e-5


@pytest.mark.parametrize("model_type", ["bsarec", "sasrec", "fmlprec"])
def test_random_weight_forward_parity_rest_of_zoo(model_type):
    """Forward parity for the remaining zoo on random (untrained)
    weights — the golden tests only cover trained BSARec checkpoints."""
    import model as ref_model_pkg

    torch.manual_seed(7)
    targs = _args(c=5, alpha=0.7)
    tm = ref_model_pkg.MODEL_DICT[model_type](targs)
    params = import_torch_checkpoint(model_type, _numpy_sd(tm), 2)
    cfg = _cfg(model_type, c=5, alpha=0.7)

    inputs, answers, negs, sem, users = _batch(8)
    want = _torch_forward(tm, inputs, users)
    got = _our_forward(cfg, params, inputs, users)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
