"""Data pipeline vs the reference's split semantics (`src/dataset.py`)."""

import numpy as np
import pytest

from bsarec_tpu.data.corpus import Corpus
from bsarec_tpu.data.pipeline import SeqRecData


def toy_corpus():
    return Corpus(
        user_seq=[
            [1, 2, 3, 4, 5],
            [6, 7, 8, 9, 10, 4, 11],
            [3, 4],
            [2, 3, 4],
        ],
        max_item=11,
    )


def test_prefix_expansion_counts_and_rows():
    data = SeqRecData(toy_corpus(), max_len=4)
    # user 0: items[-(6):-2] = [1,2,3] -> 3 samples
    # user 1: seq[-6:-2] = [8,9,10,4] -> 4 samples (max_len cap)
    # user 2: seq[:-2] = [] -> 0 samples
    # user 3: [2] -> 1 sample
    assert data.train.num_samples == 8
    # user 0 samples: (input=[], ans=1), ([1], 2), ([1,2], 3)
    np.testing.assert_array_equal(data.train.input_ids[0], [0, 0, 0, 0])
    assert data.train.answers[0] == 1
    np.testing.assert_array_equal(data.train.input_ids[2], [0, 0, 1, 2])
    assert data.train.answers[2] == 3
    # user 1: seq[-6:-2] = [7,8,9,10]; first sample: input [], answer 7
    assert data.train.answers[3] == 7
    np.testing.assert_array_equal(data.train.input_ids[6], [0, 7, 8, 9])
    assert data.train.answers[6] == 10
    assert list(data.train.user_ids) == [0, 0, 0, 1, 1, 1, 1, 3]


def test_eval_splits():
    data = SeqRecData(toy_corpus(), max_len=4)
    # valid: input seq[:-2] (last 4), answer seq[-2]
    np.testing.assert_array_equal(data.valid.input_ids[0], [0, 1, 2, 3])
    assert data.valid.answers[0] == 4
    np.testing.assert_array_equal(data.valid.input_ids[1], [7, 8, 9, 10])
    assert data.valid.answers[1] == 4
    # test: input seq[:-1] (last 4), answer seq[-1]
    np.testing.assert_array_equal(data.test.input_ids[0], [1, 2, 3, 4])
    assert data.test.answers[0] == 5
    assert data.test.answers[1] == 11
    # seen lists: valid masks items[:-2], test masks items[:-1]
    assert set(data.valid.seen_items[0]) - {0} == {1, 2, 3}
    assert set(data.test.seen_items[0]) - {0} == {1, 2, 3, 4}
    assert set(data.test.seen_items[1]) - {0} == {6, 7, 8, 9, 10, 4}


def test_same_target_sampling():
    corpus = Corpus(
        user_seq=[[1, 2, 9, 9, 9], [3, 2, 9, 9, 9], [1, 2, 9, 9, 9], [5, 9, 9, 9]],
        max_item=9,
    )
    data = SeqRecData(corpus, max_len=4)
    rng = np.random.default_rng(0)
    sem = data.sample_same_target(rng)
    assert sem.shape == data.train.input_ids.shape
    answers = data.train.answers
    # every sem row must be the input row of some train sample with the same answer
    for i in range(data.train.num_samples):
        cands = data.train.input_ids[answers == answers[i]]
        assert any((sem[i] == c).all() for c in cands)
    # answer=2 group has two distinct prefixes ([1] vs [3]); resampling
    # must eventually pick the *other* one for those rows
    rows2 = np.nonzero(answers == 2)[0]
    assert len(rows2) == 3
    seen_other = False
    for _ in range(20):
        sem = data.sample_same_target(rng)
        for r in rows2:
            if not (sem[r] == data.train.input_ids[r]).all():
                seen_other = True
    assert seen_other


@pytest.mark.slow
def test_beauty_scale_counts():
    from bsarec_tpu.data.corpus import load_corpus

    corpus = load_corpus("/root/reference/src/data/Beauty.txt")
    assert corpus.num_users == 22363
    assert corpus.max_item == 12101
    data = SeqRecData(corpus, max_len=50)
    # prefix-expanded sample count cited in BASELINE.md
    assert data.train.num_samples == 150258
    assert data.valid.num_users == 22363
