"""Golden-checkpoint parity: importing the reference's trained torch
state-dict and running OUR eval pipeline must reproduce the reference's
logged test metrics (SURVEY.md §4 golden-run strategy).

Reference evidence: `src/output/BSARec_Beauty_best.log:258` —
HR@5 0.0736, NDCG@5 0.0523, HR@10 0.1008, NDCG@10 0.0611,
HR@20 0.1373, NDCG@20 0.0703.
"""

import logging

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from bsarec_tpu.config import ModelConfig, TrainConfig
from bsarec_tpu.data.corpus import load_corpus
from bsarec_tpu.data.pipeline import SeqRecData
from bsarec_tpu.train.torch_import import import_torch_checkpoint
from bsarec_tpu.train.trainer import Trainer

CKPT = "/root/reference/src/output/BSARec_Beauty_best.pt"
GOLDEN = {
    "HR@5": 0.0736, "NDCG@5": 0.0523,
    "HR@10": 0.1008, "NDCG@10": 0.0611,
    "HR@20": 0.1373, "NDCG@20": 0.0703,
}


def _logger():
    lg = logging.getLogger("torch_import_test")
    lg.addHandler(logging.NullHandler())
    lg.propagate = False
    return lg


@pytest.mark.slow
def test_imported_bsarec_beauty_reproduces_logged_metrics():
    corpus = load_corpus("/root/reference/src/data/Beauty.txt")
    data = SeqRecData(corpus, max_len=50)
    model_cfg = ModelConfig(
        model_type="bsarec", item_size=corpus.item_size,
        num_users=corpus.num_users + 1, max_seq_length=50, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=1, c=5, alpha=0.7,
    )
    trainer = Trainer(model_cfg, TrainConfig(), data, _logger(), "/tmp/unused.ckpt")
    trainer.params = import_torch_checkpoint("bsarec", CKPT, num_layers=2)
    scores, _ = trainer.test(0)
    got = dict(zip(["HR@5", "NDCG@5", "HR@10", "NDCG@10", "HR@20", "NDCG@20"], scores))
    for key, want in GOLDEN.items():
        assert abs(got[key] - want) < 5e-4, (key, got[key], want)


def test_import_key_mapping_shapes():
    params = import_torch_checkpoint("bsarec", CKPT, num_layers=2)
    assert params["item_embeddings"]["embedding"].shape == (12102, 64)
    assert params["block_0"]["layer"]["filter_layer"]["sqrt_beta"].shape == (1, 1, 64)
    # torch [out, in] -> flax [in, out]
    assert params["block_0"]["feed_forward"]["dense_1"]["kernel"].shape == (64, 256)


@pytest.mark.slow
def test_imported_bsarec_lastfm_reproduces_logged_metrics():
    """Second golden checkpoint (`src/output/BSARec_LastFM_best.log:237`).
    @5/@10 reproduce exactly; @20 sits one user off (1/1090) from a
    masked-score tie the reference's argpartition breaks differently."""
    corpus = load_corpus("/root/reference/src/data/LastFM.txt")
    data = SeqRecData(corpus, max_len=50)
    model_cfg = ModelConfig(
        model_type="bsarec", item_size=corpus.item_size,
        num_users=corpus.num_users + 1, max_seq_length=50, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=1, c=3, alpha=0.9,
    )
    trainer = Trainer(model_cfg, TrainConfig(), data, _logger(), "/tmp/unused2.ckpt")
    trainer.params = import_torch_checkpoint(
        "bsarec", "/root/reference/src/output/BSARec_LastFM_best.pt", num_layers=2
    )
    scores, _ = trainer.test(0)
    got = dict(zip(["HR@5", "NDCG@5", "HR@10", "NDCG@10", "HR@20", "NDCG@20"], scores))
    golden = {
        "HR@5": 0.0523, "NDCG@5": 0.0344,
        "HR@10": 0.0807, "NDCG@10": 0.0435,
        "HR@20": 0.1174, "NDCG@20": 0.0526,
    }
    for key, want in golden.items():
        tol = 5e-4 if "20" not in key else 1.5e-3  # one-user tie at @20
        assert abs(got[key] - want) < tol, (key, got[key], want)
