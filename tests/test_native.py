"""Native data runtime (native/seqrec.cpp) vs pure-Python reference paths.

The native library accelerates host-side data preparation; outputs must be
bit-identical to the Python/numpy implementations (except the same-target
resample, which uses its own deterministic RNG — there we check the
distributional contract instead).
"""

import numpy as np
import pytest

from bsarec_tpu import native
from bsarec_tpu.data.corpus import Corpus
from bsarec_tpu.data.pipeline import SeqRecData

pytestmark = pytest.mark.skipif(native.lib() is None, reason="no native toolchain")


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("corpus") / "tiny.txt"
    rng = np.random.default_rng(3)
    lines = []
    for u in range(40):
        n = rng.integers(1, 25)
        items = rng.integers(1, 90, size=n)
        lines.append(f"{u + 1} " + " ".join(map(str, items)))
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def _python_corpus(path):
    user_seq = []
    max_item = 0
    with open(path) as fh:
        for line in fh:
            items = [int(t) for t in line.strip().split(" ")[1:]]
            if items:
                max_item = max(max_item, max(items))
            user_seq.append(items)
    return Corpus(user_seq=user_seq, max_item=max_item)


def test_corpus_parse_matches_python(corpus_file):
    offsets, items, max_item = native.parse_corpus(corpus_file)
    ref = _python_corpus(corpus_file)
    assert max_item == ref.max_item
    assert offsets.shape[0] == ref.num_users + 1
    for u, seq in enumerate(ref.user_seq):
        np.testing.assert_array_equal(items[offsets[u] : offsets[u + 1]], seq)


def test_splits_match_python(corpus_file):
    ref = _python_corpus(corpus_file)
    native_corpus = Corpus(user_seq=None, max_item=ref.max_item, offsets=None, items=None)
    native_corpus.offsets, native_corpus.items, _ = native.parse_corpus(corpus_file)

    fast = SeqRecData(native_corpus, max_len=10)
    # force the pure-Python path for the reference build
    slow = SeqRecData.__new__(SeqRecData)
    slow.corpus, slow.max_len, slow.item_size = ref, 10, ref.item_size
    slow.train = SeqRecData._build_train(ref.user_seq, 10)
    slow.valid = SeqRecData._build_eval(ref.user_seq, 10, mode="valid")
    slow.test = SeqRecData._build_eval(ref.user_seq, 10, mode="test")

    np.testing.assert_array_equal(fast.train.input_ids, slow.train.input_ids)
    np.testing.assert_array_equal(fast.train.answers, slow.train.answers)
    np.testing.assert_array_equal(fast.train.user_ids, slow.train.user_ids)
    for mode in ("valid", "test"):
        f, s = getattr(fast, mode), getattr(slow, mode)
        np.testing.assert_array_equal(f.input_ids, s.input_ids)
        np.testing.assert_array_equal(f.answers, s.answers)
        # seen widths may differ (max vs exact); compare zero-trimmed rows
        for u in range(f.num_users):
            fr, sr = f.seen_items[u], s.seen_items[u]
            np.testing.assert_array_equal(fr[fr > 0], sr[sr > 0])


def test_bitmask_matches_python(corpus_file):
    from bsarec_tpu.ops.pallas_rank import TILE_COLS

    rng = np.random.default_rng(0)
    seen = rng.integers(0, 9000, size=(13, 37)).astype(np.int32)
    got = native.seen_bitmask(seen, 9000, TILE_COLS)

    # python reference (the fallback body of build_seen_bitmask)
    w = TILE_COLS // 32
    vp = -(-9000 // TILE_COLS) * TILE_COLS
    out = np.zeros((13, vp // 32), np.uint32)
    out[:, 0] = 1
    rows = np.repeat(np.arange(13), 37)
    ids = seen.reshape(-1).astype(np.int64)
    keep = ids > 0
    rows, ids = rows[keep], ids[keep]
    u = ids % TILE_COLS
    np.bitwise_or.at(
        out, (rows, (ids // TILE_COLS) * w + u % w), np.uint32(1) << (u // w).astype(np.uint32)
    )
    np.testing.assert_array_equal(got.view(np.uint32), out)


def test_same_target_contract(corpus_file):
    """Native resample obeys the semantic contract: every pick shares the
    row's answer; rows in diverse groups avoid identical sequences."""
    native_corpus = Corpus(user_seq=None, max_item=0)
    native_corpus.offsets, native_corpus.items, native_corpus.max_item = native.parse_corpus(corpus_file)
    data = SeqRecData(native_corpus, max_len=10)
    rng = np.random.default_rng(7)
    sem = data.sample_same_target(rng)
    assert sem.shape == data.train.input_ids.shape

    order, starts, ends, diversity, hashed = data._same_target_groups
    answers = data.train.answers
    pick = native.same_target_pick(
        order.astype(np.int32), starts[answers].astype(np.int32),
        np.maximum(ends[answers] - starts[answers], 1).astype(np.int32),
        diversity[answers].astype(np.uint8), hashed, 1234,
    )
    # picks share the answer item
    np.testing.assert_array_equal(answers[pick], answers)
    # diverse rows avoid identical sequences (up to bounded retries)
    div = diversity[answers]
    same_seq = hashed[pick] == hashed[np.arange(len(pick))]
    assert (same_seq & div).mean() < 0.05


def test_intwtime_parse_matches_python(tmp_path, monkeypatch):
    """PREPRec CSV fast path: native columns and the loaded
    PrepRecDataset are bit-identical to the pure-Python loader, with
    interleaved users, float-formatted timestamps (int(float(x))
    truncation), 4-field rows, and a trailing newline."""
    from bsarec_tpu.preprec.data import load_intwtime

    path = tmp_path / "toy_intwtime.csv"
    rng = np.random.default_rng(5)
    lines = []
    for u in range(12):
        for k in range(int(rng.integers(4, 15))):
            t = int(rng.integers(0, 500))
            ts = f"{t}.0" if k % 3 == 0 else str(t)  # float-formatted rows
            row = f"{u},{int(rng.integers(0, 60))},{k},{k % 7},{ts}"
            if k % 5 == 4:
                row = ",".join(row.split(",")[:4])  # 4-field rows (te=0)
            lines.append(row)
    rng.shuffle(lines)  # users interleaved in file order
    path.write_text("\n".join(lines) + "\n")

    parsed = native.parse_intwtime(str(path))
    assert parsed is not None
    (u1, i1, t1, t2, te), usernum, itemnum = parsed
    # python reference for the flat columns
    exp = []
    for line in path.read_text().splitlines():
        parts = line.split(",")
        exp.append((int(parts[0]) + 1, int(parts[1]) + 1, int(parts[2]),
                    int(parts[3]), int(float(parts[4])) if len(parts) > 4 else 0))
    exp = np.asarray(exp, np.int32)
    np.testing.assert_array_equal(np.stack([u1, i1, t1, t2, te], 1), exp)
    assert usernum == exp[:, 0].max() and itemnum == exp[:, 1].max()

    fast = load_intwtime(str(path), maxlen=8)
    monkeypatch.setattr(native, "parse_intwtime", lambda _: None)
    slow = load_intwtime(str(path), maxlen=8)
    for field in fast.__dataclass_fields__:
        np.testing.assert_array_equal(
            getattr(fast, field), getattr(slow, field), err_msg=field)

    # malformed content falls back to Python rather than silently
    # diverging: scientific notation, blank lines (Python's int('')
    # raises), and values outside int32 (numpy assignment raises)
    for bad in ("0,1,2,3,1e3\n",
                "0,1,2,3,4\n\n1,1,2,3,4\n",
                f"0,1,2,3,{2**31 + 5}\n",
                f"{2**31 - 1},1,2,3,4\n"):  # u+1 would overflow int32
        path.write_text(bad)
        assert native.parse_intwtime(str(path)) is None, bad
