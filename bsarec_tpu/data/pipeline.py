"""Device-resident input pipeline.

The reference feeds the model with CPU DataLoader worker processes
(`src/dataset.py:207-221`) doing per-sample Python work (prefix
expansion, left padding, rejection negative sampling). At BSARec's
scale the whole prefix-expanded training set is ~30 MB, so the TPU
redesign pre-materializes every split as fixed-shape int32 arrays that
live in HBM for the entire run:

- train:  [N, L] inputs, [N] answers, [N] user ids — one row per
  history prefix (semantics of `src/dataset.py:18-23, 61-117`);
- valid/test: [U, L] inputs, [U] answers, plus 0-padded per-user
  seen-item lists replacing the scipy CSR rating matrices
  (`src/dataset.py:126-168`) for on-device eval masking.

Negative sampling and batch shuffling then happen *on device inside
the jitted epoch* (see `train/loop.py`) — no host↔device traffic in
the steady state. The contrastive `same_target` view (DuoRec/FEARec,
`src/dataset.py:41-56,83-106`) is resampled per epoch on host from a
grouped-by-answer index, vectorized in numpy.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from bsarec_tpu.data.corpus import Corpus


@dataclasses.dataclass
class EvalSplit:
    input_ids: np.ndarray  # [U, L] int32
    answers: np.ndarray  # [U] int32
    seen_items: np.ndarray  # [U, S] int32, 0-padded

    @property
    def num_users(self) -> int:
        return self.input_ids.shape[0]


@dataclasses.dataclass
class TrainSplit:
    input_ids: np.ndarray  # [N, L] int32
    answers: np.ndarray  # [N] int32
    user_ids: np.ndarray  # [N] int32

    @property
    def num_samples(self) -> int:
        return self.input_ids.shape[0]


def _left_pad(seq: list[int], max_len: int) -> list[int]:
    seq = seq[-max_len:]
    return [0] * (max_len - len(seq)) + seq


class SeqRecData:
    """All splits of one corpus, materialized as numpy arrays."""

    def __init__(self, corpus: Corpus, max_len: int):
        self.corpus = corpus
        self.max_len = max_len
        self.item_size = corpus.item_size

        from bsarec_tpu import native

        offsets = items = None
        if native.lib() is not None:
            offsets, items = corpus.csr
        if offsets is not None:
            # native fast path (native/seqrec.cpp), identical outputs —
            # pinned by tests/test_native.py
            inputs, answers, users = native.prefix_expand(offsets, items, max_len)
            self.train = TrainSplit(inputs, answers, users)
            lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
            for mode, drop in (("valid", 2), ("test", 1)):
                seen_w = max(int((lens - drop).max(initial=1)), 1)
                ins, ans, seen = native.eval_split(offsets, items, max_len, drop, seen_w)
                setattr(self, mode, EvalSplit(ins, ans, seen))
        else:
            self.train = self._build_train(corpus.lists, max_len)
            self.valid = self._build_eval(corpus.lists, max_len, mode="valid")
            self.test = self._build_eval(corpus.lists, max_len, mode="test")
        self._same_target_groups = None

    @staticmethod
    def _build_train(user_seq: list[list[int]], max_len: int) -> TrainSplit:
        # prefix expansion: user's training items are seq[-(L+2):-2]; one
        # sample per prefix, answer = last prefix item, input = the rest.
        counts = [min(len(s) - 2, max_len) if len(s) > 2 else max(len(s) - 2, 0) for s in user_seq]
        # reference takes seq[-(L+2):-2] then one sample per element —
        # length = len(seq[-(L+2):-2]) = min(len(seq) - 2, L) when len>2
        total = sum(max(c, 0) for c in counts)
        inputs = np.zeros((total, max_len), dtype=np.int32)
        answers = np.zeros((total,), dtype=np.int32)
        users = np.zeros((total,), dtype=np.int32)
        row = 0
        for user, seq in enumerate(user_seq):
            items = seq[-(max_len + 2) : -2]
            for i in range(len(items)):
                # prefix items[: i + 1]; answer items[i]; input items[:i]
                if i > 0:
                    inputs[row, max_len - i :] = items[:i]
                answers[row] = items[i]
                users[row] = user
                row += 1
        assert row == total
        return TrainSplit(inputs, answers, users)

    @staticmethod
    def _build_eval(user_seq: list[list[int]], max_len: int, mode: str) -> EvalSplit:
        drop = 2 if mode == "valid" else 1
        num_users = len(user_seq)
        inputs = np.zeros((num_users, max_len), dtype=np.int32)
        answers = np.zeros((num_users,), dtype=np.int32)
        seen_len = max((len(s) - drop for s in user_seq), default=0)
        seen = np.zeros((num_users, max(seen_len, 1)), dtype=np.int32)
        for user, seq in enumerate(user_seq):
            if len(seq) < drop + 1:
                continue  # degenerate rows keep zeros (masked out downstream)
            hist = seq[:-drop]
            row = _left_pad(hist, max_len)
            inputs[user] = row
            answers[user] = seq[-drop]
            seen[user, : len(hist)] = hist
        return EvalSplit(inputs, answers, seen)

    # ---- contrastive same-target view (DuoRec / FEARec) ----------------
    def _build_same_target_groups(self):
        """Group train sample rows by answer item; flag groups that
        contain at least two distinct sequences (reference `keep_random`,
        `src/dataset.py:86-96`)."""
        answers = self.train.answers
        order = np.argsort(answers, kind="stable")
        sorted_ans = answers[order]
        starts = np.searchsorted(sorted_ans, np.arange(self.item_size))
        ends = np.searchsorted(sorted_ans, np.arange(self.item_size), side="right")
        rows = self.train.input_ids
        # distinctness per group: >1 unique (input row) among members
        diversity = np.zeros(self.item_size, dtype=bool)
        hashed = np.array(
            [hash(rows[i].tobytes()) for i in range(rows.shape[0])], dtype=np.int64
        )
        for item in range(self.item_size):
            s, e = starts[item], ends[item]
            if e - s > 1:
                diversity[item] = np.unique(hashed[order[s:e]]).size > 1
        self._same_target_groups = (order, starts, ends, diversity, hashed)

    def sample_same_target(self, rng: np.random.Generator) -> np.ndarray:
        """Per-epoch resample of the semantic-augmentation view: for each
        train sample, a random *other* train sequence sharing its answer
        (falls back to itself when the group has no distinct member)."""
        if self._same_target_groups is None:
            self._build_same_target_groups()
        order, starts, ends, diversity, hashed = self._same_target_groups
        answers = self.train.answers
        n = answers.shape[0]
        group_start = starts[answers]
        group_size = np.maximum(ends[answers] - group_start, 1)

        from bsarec_tpu import native

        pick = native.same_target_pick(
            order.astype(np.int32), group_start.astype(np.int32),
            group_size.astype(np.int32), diversity[answers].astype(np.uint8),
            hashed, int(rng.integers(0, 2**63 - 1)),
        )
        if pick is None:  # numpy fallback, same semantics
            pick = order[group_start + (rng.integers(0, 1 << 62, size=n) % group_size)]
            # re-pick rows that landed on an identical sequence while the
            # group offers diversity (bounded retries — collision prob decays)
            for _ in range(8):
                bad = (hashed[pick] == hashed[np.arange(n)]) & diversity[answers]
                if not bad.any():
                    break
                idx = np.nonzero(bad)[0]
                repick = order[group_start[idx] + (rng.integers(0, 1 << 62, size=idx.size) % group_size[idx])]
                pick[idx] = repick
        sem = self.train.input_ids[pick].copy()
        # reference uses sem_aug[:-1] (drops the answer; inputs already
        # exclude it) — the picked row's *input* is exactly that view
        return sem
