"""PREPRec ranked evaluation, on device.

Reference behavior (`repo-b/utils.py:314-620`): per user the ground
truth competes against 100 pre-sampled negatives (eval_method=1) or
the full catalog (=3); the ground-truth's rank uses random tie-
breaking; NDCG@k = 1/log2(rank+2) if rank<k, HR@k = rank<k; reported
as [[ndcg, hr] per k]. For "test" mode the validation item is appended
to the history (unless no_valid_in_test/sparse). Candidate popularity
times are the target interaction's own (lag-shifted) times, or the
last history time when prev_time.

The reference chunks users×items on host to fit GPU memory
(`utils.py:492-545`); here scoring, tie-broken ranking and metric
sums run inside one jitted scan over user batches.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from bsarec_tpu.preprec.config import PrepRecConfig
from bsarec_tpu.preprec.data import PrepRecDataset


@dataclasses.dataclass
class EvalInputs:
    """Host-built fixed-shape eval arrays for one mode (valid/test)."""

    seqs: np.ndarray  # [U, maxlen]
    t1: np.ndarray  # [U, maxlen] (lag-shifted)
    t2: np.ndarray
    te: np.ndarray  # [U, maxlen]
    cands: np.ndarray  # [U, C] candidate items, col 0 = ground truth
    cand_t1: np.ndarray  # [U, C]
    cand_t2: np.ndarray
    users: np.ndarray  # [U] 1-based


def build_eval_inputs(ds: PrepRecDataset, cfg: PrepRecConfig, mode: str, usernegs: np.ndarray | None) -> EvalInputs:
    maxlen = cfg.maxlen
    seqs = ds.train_seq.copy()
    t1 = ds.train_t1.copy()
    t2 = ds.train_t2.copy()
    if mode == "test":
        if not cfg.no_valid_in_test and (not cfg.sparse or cfg.override_sparse):
            seqs = np.concatenate([seqs, ds.valid_item[:, None]], axis=1)
            t1 = np.concatenate([t1, ds.valid_t1[:, None]], axis=1)
            t2 = np.concatenate([t2, ds.valid_t2[:, None]], axis=1)
        target, tgt_t1, tgt_t2, te = ds.test_item, ds.test_t1, ds.test_t2, ds.test_te
    else:
        target, tgt_t1, tgt_t2, te = ds.valid_item, ds.valid_t1, ds.valid_t2, ds.valid_te
    seqs, t1, t2 = seqs[:, -maxlen:], t1[:, -maxlen:], t2[:, -maxlen:]

    if cfg.eval_method == 3 or usernegs is None:
        cands = np.tile(np.arange(1, ds.itemnum + 1, dtype=np.int32), (ds.usernum, 1))
        cands = np.concatenate([target[:, None].astype(np.int32), cands], axis=1)
    else:
        cands = np.concatenate([target[:, None].astype(np.int32), usernegs], axis=1)

    # lag shift (utils.py:509; model applies none at predict time)
    lag_t1 = np.maximum(0, t1 - 1 - cfg.lag // 4)
    lag_t2 = np.maximum(0, t2 - cfg.lag)
    it1 = np.maximum(0, tgt_t1 - 1 - cfg.lag // 4)
    it2 = np.maximum(0, tgt_t2 - cfg.lag)
    if cfg.prev_time:
        cand_t1 = np.repeat(lag_t1[:, -1:], cands.shape[1], axis=1)
        cand_t2 = np.repeat(lag_t2[:, -1:], cands.shape[1], axis=1)
    else:
        cand_t1 = np.repeat(it1[:, None], cands.shape[1], axis=1)
        cand_t2 = np.repeat(it2[:, None], cands.shape[1], axis=1)

    return EvalInputs(
        seqs.astype(np.int32), lag_t1.astype(np.int32), lag_t2.astype(np.int32),
        te.astype(np.int32), cands.astype(np.int32),
        cand_t1.astype(np.int32), cand_t2.astype(np.int32),
        np.arange(1, ds.usernum + 1, dtype=np.int32),
    )


def ranks_from_scores(scores: jnp.ndarray, key) -> jnp.ndarray:
    """Rank (0-based) of column 0 with random tie-breaking, equal to the
    reference's structured argsort over (-score, random) (utils.py:553-558)."""
    tiebreak = jax.random.uniform(key, scores.shape)
    better = scores > scores[:, :1]
    tied = (scores == scores[:, :1]) & (tiebreak > tiebreak[:, :1])
    tied = tied.at[:, 0].set(False)
    return jnp.sum(better | tied, axis=1)


def metrics_from_ranks(ranks: np.ndarray, topk) -> list:
    """[[ndcg@k, hr@k], ...] per k (utils.py:398-412 semantics)."""
    out = []
    n = max(len(ranks), 1)
    for k in topk:
        sel = ranks[ranks < k]
        ndcg = float(np.sum(1.0 / np.log2(sel + 2)) / n)
        hr = float(len(sel) / n)
        out.append([round(ndcg, 3), round(hr, 3)])
    return out


def grouped_metrics(ranks: np.ndarray, userpop: np.ndarray, cfg: PrepRecConfig) -> list:
    """Per user-popularity-percentile-group metrics (utils.py:329-337,
    399-408): users bucketed by rank-percentile of their popularity."""
    from scipy.stats import rankdata

    perc = 100 * rankdata(userpop) / len(userpop)
    perc[perc > 99] = 99
    groups = (perc // cfg.quality_size).astype(int)
    numgroups = int(100 // cfg.quality_size)
    result = []
    for k in cfg.topk:
        ndcgs, hrs = [], []
        for g in range(numgroups):
            sel = ranks[groups[: len(ranks)] == g]
            if sel.size == 0:
                continue
            hit = sel[sel < k]
            ndcgs.append(round(float(np.sum(1.0 / np.log2(hit + 2)) / sel.size), 3))
            hrs.append(round(float(hit.size / sel.size), 3))
        result.append([ndcgs, hrs])
    return result


def _tiebroken_ranks(scores: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """0-based rank of column 0 with the reference's randomized tie-break
    (`repo-b/utils.py:553-558`): ties beat the ground truth with p=1/2."""
    tie = rng.random(scores.shape)
    better = scores > scores[:, :1]
    tied = (scores == scores[:, :1]) & (tie > tie[:, :1])
    tied[:, 0] = False
    return np.sum(better | tied, axis=1)


def mostpop_ranks(inputs: EvalInputs, rawpop: np.ndarray, rng: np.random.Generator, exclude_rated: bool = False) -> np.ndarray:
    """Popularity baseline (`utils.py:858-883`): score candidates by
    their cumulative interaction count. Under full-catalog eval the
    reference excludes each user's already-rated items from the
    candidate set (`utils.py:867-871`); equivalent here: their scores
    drop to -inf. The ground truth (column 0) always stays."""
    pop = np.concatenate([[0.0], rawpop])  # item 0 pad
    scores = pop[inputs.cands]
    if exclude_rated:  # full-catalog eval (eval_method 3)
        # vectorized per-user exclusion: under eval_method 3 candidate
        # column j (j>=1) IS item j, so a [U, V+1] scatter of the padded
        # history marks every rated candidate in one shot — no O(U·V)
        # Python loop over np.isin.
        itemnum = scores.shape[1] - 1
        assert inputs.seqs.max() <= itemnum, "exclude_rated requires full-catalog candidates"
        rated = np.zeros((scores.shape[0], itemnum + 1), dtype=bool)
        np.put_along_axis(rated, inputs.seqs.astype(np.int64), True, axis=1)
        scores[:, 1:][rated[:, 1:]] = -np.inf
    return _tiebroken_ranks(scores, rng)


def ensemble_ranks(scores: np.ndarray, loaded: np.ndarray, alphas, rng: np.random.Generator | None = None) -> list[np.ndarray]:
    """Blend saved scores with fresh ones and re-rank (reference
    `repo-b/utils.py:548-551`: total = alpha*new + (1-alpha)*saved; the
    ground truth sits in column 0). Returns one rank array per alpha.

    The reference's ensemble path ranks with a plain argsort — NO random
    tie-break (only the non-ensemble path randomizes ties). With rng
    None, ties count strictly-greater scores only, which matches the
    reference exactly on tie-free scores but is a small SYSTEMATICALLY
    OPTIMISTIC approximation on ties: the ground-truth column always
    gets the best rank within its tie group, whereas the reference's
    unstable np.argsort places it arbitrarily. Pass the run rng
    explicitly to opt into randomized ties instead."""
    blends = [alpha * scores + (1.0 - alpha) * loaded for alpha in alphas]
    if rng is None:
        return [np.sum(b > b[:, :1], axis=1) for b in blends]
    return [_tiebroken_ranks(b, rng) for b in blends]


def make_eval_fn(model, cfg: PrepRecConfig, pop_enc, eval_pop, batch: int, num_users: int, return_scores: bool = False):
    """jitted scan over user batches -> ranks [U] (or raw scores [U, C]
    when return_scores, for --save_scores / --use_scores ensembling)."""
    steps = math.ceil(num_users / batch)
    padded = steps * batch

    def score_batch(params, key, seqs, t1, t2, te, cands, ct1, ct2, users):
        name = cfg.model
        if name == "newrec":
            feats = pop_enc(seqs, t1, t2)
            if cfg.use_week_eval and eval_pop is not None:
                cand_feats = eval_pop(cands, ct1, users)
            else:
                cand_feats = pop_enc(cands, ct1, ct2)
            scores = model.apply(
                {"params": params}, feats, seqs == 0, cand_feats,
                te if cfg.time_embed else None, method="predict",
            )
        elif name == "newb4rec":
            feats = pop_enc(seqs, t1, t2)
            cand_feats = pop_enc(cands, ct1, ct2)
            scores = model.apply(
                {"params": params}, feats, seqs > 0, cand_feats, method="predict"
            )
        elif name == "bprmf":
            scores = model.apply({"params": params}, users, cands, method="predict")
        else:  # sasrec / bert4rec / cl4srec
            scores = model.apply({"params": params}, seqs, cands, method="predict")
        if return_scores:
            return scores
        return ranks_from_scores(scores, key)

    def evaluate(params, key, arrays):
        idx_all = jnp.arange(padded).reshape(steps, batch)

        def body(carry, xs):
            idx, step = xs
            safe = jnp.minimum(idx, num_users - 1)
            bkey = jax.random.fold_in(key, step)
            r = score_batch(
                params, bkey,
                arrays["seqs"][safe], arrays["t1"][safe], arrays["t2"][safe],
                arrays["te"][safe], arrays["cands"][safe],
                arrays["cand_t1"][safe], arrays["cand_t2"][safe],
                arrays["users"][safe],
            )
            return carry, r

        _, ranks = jax.lax.scan(body, None, (idx_all, jnp.arange(steps)))
        if return_scores:
            return ranks.reshape(steps * batch, -1)[:num_users]
        return ranks.reshape(-1)[:num_users]

    return jax.jit(evaluate), steps
