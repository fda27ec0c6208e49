"""PREPRec ranked evaluation, on device, memory-bounded.

Reference behavior (`repo-b/utils.py:314-620`): per user the ground
truth competes against 100 pre-sampled negatives (eval_method=1) or
the full catalog (=3, candidates = [gt] + arange(1..V) — the ground
truth appears twice, `utils.py:502-509`); the ground-truth's rank uses
random tie-breaking; NDCG@k = 1/log2(rank+2) if rank<k, HR@k = rank<k;
reported as [[ndcg, hr] per k]. For "test" mode the validation item is
appended to the history (unless no_valid_in_test/sparse). Candidate
popularity times are the target interaction's own (lag-shifted) times,
or the last history time when prev_time — constant across candidates
either way (`utils.py:512-518`), so they are stored as per-user
COLUMNS here, not [U, C] tiles.

The reference chunks users x items on host to fit GPU memory
(`utils.py:492-545`: `len(users)*itemnum/7e8` partitions, user blocks
of 125, item blocks of 101). Here full-catalog candidates are IMPLICIT
(one arange sweep shared by every user) and the ground-truth rank is
accumulated streaming over item chunks inside one jitted scan: nothing
of size [U, V] is ever materialized on host or device, so eval_method 3
runs at production catalog scale. Every model factors its `predict`
into final-state [B, H] x candidate-embedding [B, C, H]; chunking that
per-candidate dot product is bit-exact vs the monolithic einsum.
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
    """Host-built fixed-shape eval arrays for one mode (valid/test).

    `cands` is the explicit [U, C] candidate matrix (column 0 = ground
    truth) for sampled-negative eval; None means implicit full-catalog
    candidates ([target] + arange(1..itemnum), never materialized).
    """

    seqs: np.ndarray  # [U, maxlen]
    t1: np.ndarray  # [U, maxlen] (lag-shifted)
    t2: np.ndarray
    te: np.ndarray  # [U, maxlen]
    target: np.ndarray  # [U] ground-truth item (candidate column 0)
    cands: np.ndarray | None  # [U, C] explicit candidates, or None
    cand_t1: np.ndarray  # [U] candidate t1 (constant across candidates)
    cand_t2: np.ndarray  # [U]
    users: np.ndarray  # [U] 1-based
    itemnum: int

    @property
    def num_cands(self) -> int:
        return self.cands.shape[1] if self.cands is not None else self.itemnum + 1


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
        cands = None  # implicit [gt] + arange(1..V) sweep
    else:
        cands = np.concatenate(
            [target[:, None].astype(np.int32), usernegs.astype(np.int32)], axis=1
        )

    # lag shift (utils.py:509; model applies none at predict time)
    lag_t1 = np.maximum(0, t1 - 1 - cfg.lag // 4)
    lag_t2 = np.maximum(0, t2 - cfg.lag)
    it1 = np.maximum(0, tgt_t1 - 1 - cfg.lag // 4)
    it2 = np.maximum(0, tgt_t2 - cfg.lag)
    if cfg.prev_time:
        cand_t1, cand_t2 = lag_t1[:, -1], lag_t2[:, -1]
    else:
        cand_t1, cand_t2 = it1, it2

    return EvalInputs(
        seqs.astype(np.int32), lag_t1.astype(np.int32), lag_t2.astype(np.int32),
        te.astype(np.int32), target.astype(np.int32), cands,
        cand_t1.astype(np.int32), cand_t2.astype(np.int32),
        np.arange(1, ds.usernum + 1, dtype=np.int32), int(ds.itemnum),
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
    candidate set (`utils.py:867-871`). The full-catalog branch never
    materializes [U, V]: because every user scores the SAME popularity
    vector, the rank decomposes into order statistics of the sorted
    catalog popularity minus per-user rated-item corrections, and the
    tie group collapses to one Binomial draw (each tied candidate
    independently beats the ground truth with p = P(u_i > u_gt | u_gt)
    = 1 - u_gt, exactly the monolithic tie-break's conditional law)."""
    pop = np.concatenate([[0.0], np.asarray(rawpop, dtype=np.float64)])  # item 0 pad
    if inputs.cands is not None:
        scores = pop[inputs.cands]
        if exclude_rated:
            raise ValueError(
                "exclude_rated applies to full-catalog (eval_method 3) "
                "candidates; sampled negatives are pre-filtered offline"
            )
        return _tiebroken_ranks(scores, rng)

    # implicit full catalog: [gt] + arange(1..V), rated items excluded
    tgt_pop = pop[inputs.target]  # [U]
    cat = np.sort(pop[1:])  # catalog popularity ascending
    v = cat.size
    n_ge = v - np.searchsorted(cat, tgt_pop, side="left")
    n_gt = v - np.searchsorted(cat, tgt_pop, side="right")
    # the tie group includes the ground truth's own catalog copy (the
    # sweep is [gt] + arange(1..V), so gt competes against its duplicate)
    n_tied = n_ge - n_gt

    if exclude_rated:
        # subtract each user's rated items from the counts (the
        # reference removes them from the candidate list entirely,
        # utils.py:867-871); histories are 0-padded and may repeat
        for i in range(inputs.seqs.shape[0]):
            rated = np.unique(inputs.seqs[i])
            rated = rated[rated > 0]
            rp = pop[rated]
            n_gt[i] -= int(np.sum(rp > tgt_pop[i]))
            n_tied[i] -= int(np.sum(rp == tgt_pop[i]))

    u_gt = rng.random(tgt_pop.shape[0])
    wins = rng.binomial(np.maximum(n_tied, 0), np.clip(1.0 - u_gt, 0.0, 1.0))
    return n_gt + wins


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


def make_eval_fn(model, cfg: PrepRecConfig, pop_enc, eval_pop, batch: int,
                 num_users: int, itemnum: int, return_scores: bool = False,
                 item_chunk: int = 4096):
    """jitted scan over user batches -> ranks [U] (or raw scores [U, C]
    when return_scores, for --save_scores / --use_scores ensembling).

    Full-catalog candidates (arrays without a "cands" entry) stream in
    `item_chunk`-sized id blocks: per user batch the final state is
    encoded ONCE, then an inner scan accumulates #better and #tied-wins
    against the ground-truth score — peak footprint O(batch*item_chunk)
    regardless of catalog size. With return_scores the same sweep emits
    the [batch, V+1] score rows instead (the OUTPUT is inherently
    O(U*V); the reference's --save_scores dumps the same, utils.py:546).
    """
    steps = math.ceil(num_users / batch)
    padded = steps * batch
    name = cfg.model
    if cfg.eval_method == 3 and cfg.use_week_eval:
        # the week-adjusted eval table is indexed by CANDIDATE SLOT of
        # the offline 101-candidate lists (`model_utils.py:388-481`,
        # EvalPopularity.__call__ gathers week_eval[:, :C]); applying it
        # to an arbitrary catalog sweep would silently mis-index
        raise ValueError(
            "use_week_eval is slot-indexed against the sampled-negative "
            "candidate lists and cannot be combined with full-catalog "
            "eval (eval_method 3)"
        )

    n_chunks = math.ceil(itemnum / item_chunk)

    def _build(pop):
        """Scoring closures over a given PopularityEncoding. `pop` is a
        parameter (not captured at jit level) so big tables can enter
        the jitted fn as runtime ARGUMENTS via arrays['pop_month'/'pop_week']
        — closed-over tables get baked into the lowered module as
        constants, and at production scale (~500 MB at 1M items) that
        module cannot even upload to the remote compiler (HTTP 413,
        `results/r5_runs/preprec_scale_1m.log` round 5)."""

        # --- every model's predict factors as final_state . cand_embed --
        def final_state(params, seqs, t1, t2, te, users):
            """[B, H]; identical math to each model's `predict` prefix."""
            if name == "newrec":
                feats = pop(seqs, t1, t2)
                out = model.apply(
                    {"params": params}, feats, seqs == 0,
                    te if cfg.time_embed else None, method="encode",
                )
                return out[:, -1, :]
            if name == "newb4rec":
                feats = pop(seqs, t1, t2)
                return model.apply(
                    {"params": params}, feats, seqs > 0, method="encode"
                )[:, -1, :]
            if name == "bprmf":
                return model.apply(
                    {"params": params}, users, method=lambda m, u: m.user_emb(u)
                )
            return model.apply({"params": params}, seqs, method="encode")[:, -1, :]

        def cand_embed(params, cands, ct1, ct2, users):
            """[B, C, H] candidate-side embeddings (ct* broadcast [B, C])."""
            if name == "newrec":
                if cfg.use_week_eval and eval_pop is not None:
                    cf = eval_pop(cands, ct1, users)
                else:
                    cf = pop(cands, ct1, ct2)
                return model.apply({"params": params}, cf, method="embed_feats")
            if name == "newb4rec":
                cf = pop(cands, ct1, ct2)
                return model.apply({"params": params}, cf, method="embed_feats")
            return model.apply(
                {"params": params}, cands, method=lambda m, c: m.item_emb(c)
            )

        def score_cands(params, state, cands, ct1_col, ct2_col, users):
            ct1 = jnp.broadcast_to(ct1_col[:, None], cands.shape)
            ct2 = jnp.broadcast_to(ct2_col[:, None], cands.shape)
            emb = cand_embed(params, cands, ct1, ct2, users)
            return jnp.einsum("bcf,bf->bc", emb, state)

        def sweep_batch(params, key, state, target, ct1, ct2, users):
            """Streaming ground-truth rank over the implicit catalog sweep."""
            tgt_score = score_cands(params, state, target[:, None], ct1, ct2, users)[:, 0]
            gt_key, chunk_key = jax.random.split(key)
            # the monolithic tie-break compares every tied candidate's uniform
            # draw against the ground truth's single draw (utils.py:553-558);
            # same law here: one gt draw, fresh per-chunk candidate draws
            u_gt = jax.random.uniform(gt_key, tgt_score.shape)

            def chunk_body(carry, c):
                n_better, n_tiedwin = carry
                ids = 1 + c * item_chunk + jnp.arange(item_chunk, dtype=jnp.int32)
                valid = ids <= itemnum
                # clamp the tail-chunk padding ids BEFORE they reach any
                # table gather: their scores are masked by `valid`, and
                # out-of-bounds indices into catalog-scale tables must
                # never be left to gather-mode clamping semantics (the
                # 1M-item sweep faulted the TPU worker mid-execution,
                # results/r5_runs/preprec_scale_20k.log)
                ids = jnp.minimum(ids, itemnum)
                cands = jnp.broadcast_to(ids[None, :], (state.shape[0], item_chunk))
                s = score_cands(params, state, cands, ct1, ct2, users)
                u = jax.random.uniform(jax.random.fold_in(chunk_key, c), s.shape)
                better = valid[None, :] & (s > tgt_score[:, None])
                tied = valid[None, :] & (s == tgt_score[:, None]) & (u > u_gt[:, None])
                return (n_better + jnp.sum(better, axis=1),
                        n_tiedwin + jnp.sum(tied, axis=1)), None

            zero = jnp.zeros(state.shape[0], jnp.int32)
            (n_better, n_tiedwin), _ = jax.lax.scan(
                chunk_body, (zero, zero), jnp.arange(n_chunks)
            )
            return n_better + n_tiedwin

        def sweep_scores(params, state, target, ct1, ct2, users):
            """Explicit [B, V+1] score rows from the same chunked sweep."""
            tgt_score = score_cands(params, state, target[:, None], ct1, ct2, users)

            def chunk_body(_, c):
                ids = 1 + c * item_chunk + jnp.arange(item_chunk, dtype=jnp.int32)
                ids = jnp.minimum(ids, itemnum)  # see sweep_batch: no OOB gathers
                cands = jnp.broadcast_to(ids[None, :], (state.shape[0], item_chunk))
                return None, score_cands(params, state, cands, ct1, ct2, users)

            _, chunks = jax.lax.scan(chunk_body, None, jnp.arange(n_chunks))
            swept = jnp.moveaxis(chunks, 0, 1).reshape(state.shape[0], -1)[:, :itemnum]
            return jnp.concatenate([tgt_score, swept], axis=1)

        return final_state, score_cands, sweep_batch, sweep_scores

    def evaluate(params, key, arrays):
        pop = pop_enc
        if "pop_month" in arrays:
            pop = dataclasses.replace(
                pop_enc,
                month=dataclasses.replace(pop_enc.month, table=arrays["pop_month"]),
                week=dataclasses.replace(pop_enc.week, table=arrays["pop_week"]),
            )
        final_state, score_cands, sweep_batch, sweep_scores = _build(pop)
        idx_all = jnp.arange(padded).reshape(steps, batch)
        full_catalog = "cands" not in arrays

        def body(carry, xs):
            idx, step = xs
            safe = jnp.minimum(idx, num_users - 1)
            bkey = jax.random.fold_in(key, step)
            state = final_state(
                params, arrays["seqs"][safe], arrays["t1"][safe],
                arrays["t2"][safe], arrays["te"][safe], arrays["users"][safe],
            )
            ct1, ct2 = arrays["cand_t1"][safe], arrays["cand_t2"][safe]
            target, users = arrays["target"][safe], arrays["users"][safe]
            if full_catalog:
                if return_scores:
                    r = sweep_scores(params, state, target, ct1, ct2, users)
                else:
                    r = sweep_batch(params, bkey, state, target, ct1, ct2, users)
            else:
                scores = score_cands(params, state, arrays["cands"][safe], ct1, ct2, users)
                r = scores if return_scores else ranks_from_scores(scores, bkey)
            return carry, r

        _, ranks = jax.lax.scan(body, None, (idx_all, jnp.arange(steps)))
        if return_scores:
            return ranks.reshape(steps * batch, -1)[:num_users]
        return ranks.reshape(-1)[:num_users]

    return jax.jit(evaluate), steps
