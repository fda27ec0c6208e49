"""AOT candidate-set scorer export for PREPRec (VERDICT r3 item 8).

The src-side serving chain (`--export_serving` / int8 / HTTP host)
covers the BSARec zoo; PREPRec's eval is candidate-set scoring over
popularity-ENCODED inputs (`repo-b/utils.py:459-545`): items are
represented only by their popularity-percentile trajectories, which are
HOST-BUILT offline tables refreshed by the weekly preprocessing
(`preprec/preprocess.py`). The export therefore bakes BOTH the trained
params and the popularity tables as artifact constants — one
self-contained file per (checkpoint, popularity snapshot); re-export
after each offline popularity refresh, exactly as the reference re-reads
the refreshed `*_wtembed.txt` tables at startup.

Artifact call (batch-polymorphic over users):

    (seqs [b, L] i32, t1 [b, L] i32, t2 [b, L] i32,
     cands [b, C] i32, ct1 [b, C] i32, ct2 [b, C] i32, users [b] i32)
        -> scores [b, C] f32

Ranking the candidate set is a client-side argsort: deterministic
ordering is the serving contract, while the eval path's random
tie-break (`evaluate.py:_tiebroken_ranks`) is a metric protocol, not a
serving behavior. `use_week_eval` artifacts substitute the
week-adjusted eval tables for the candidate features, mirroring
`repo-b/model_utils.py:399-401`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PREPREC_CALL_DOC = (
    "(seqs [b, L] i32, t1 [b, L] i32, t2 [b, L] i32, cands [b, C] i32, "
    "ct1 [b, C] i32, ct2 [b, C] i32, users [b] i32) -> scores [b, C] f32"
)


def build_candidate_scorer(model, cfg, pop_enc, eval_pop):
    """The eval-exact candidate scoring as a pure fn of params
    (mirrors `evaluate.py:make_eval_fn:score_batch`, minus the
    rank-side randomness)."""
    if cfg.time_embed:
        raise NotImplementedError(
            "--export_serving with --time_embed: the te input is "
            "derivable only from the training-time dataset layout; "
            "serve time-embedded models in-process via make_eval_fn")

    def score(params, seqs, t1, t2, cands, ct1, ct2, users):
        name = cfg.model
        if name == "newrec":
            feats = pop_enc(seqs, t1, t2)
            if cfg.use_week_eval and eval_pop is not None:
                cand_feats = eval_pop(cands, ct1, users)
            else:
                cand_feats = pop_enc(cands, ct1, ct2)
            return model.apply({"params": params}, feats, seqs == 0,
                               cand_feats, None, method="predict")
        if name == "newb4rec":
            feats = pop_enc(seqs, t1, t2)
            cand_feats = pop_enc(cands, ct1, ct2)
            return model.apply({"params": params}, feats, seqs > 0,
                               cand_feats, method="predict")
        if name == "bprmf":
            return model.apply({"params": params}, users, cands,
                               method="predict")
        # sasrec / bert4rec / cl4srec: plain id-sequence scoring
        return model.apply({"params": params}, seqs, cands, method="predict")

    return score


def export_candidate_scorer(model, cfg, params, pop_enc, eval_pop,
                            seq_len: int, n_cands: int, path: str,
                            platforms=("cpu", "tpu")) -> dict:
    """Serialize the params+popularity-baked scorer to `path`."""
    from jax import export as jexport

    score = build_candidate_scorer(model, cfg, pop_enc, eval_pop)
    frozen = jax.device_get(params)  # baked: params AND (via the
    # pop_enc/eval_pop closures) the popularity snapshot tables

    def serve(seqs, t1, t2, cands, ct1, ct2, users):
        return score(frozen, seqs, t1, t2, cands, ct1, ct2, users)

    (b,) = jexport.symbolic_shape("b")
    i32 = jnp.int32
    exp = jexport.export(jax.jit(serve), platforms=tuple(platforms))(
        jax.ShapeDtypeStruct((b, seq_len), i32),
        jax.ShapeDtypeStruct((b, seq_len), i32),
        jax.ShapeDtypeStruct((b, seq_len), i32),
        jax.ShapeDtypeStruct((b, n_cands), i32),
        jax.ShapeDtypeStruct((b, n_cands), i32),
        jax.ShapeDtypeStruct((b, n_cands), i32),
        jax.ShapeDtypeStruct((b,), i32),
    )
    blob = exp.serialize()
    with open(path, "wb") as fh:
        fh.write(blob)
    return {"path": path, "bytes": len(blob), "call": PREPREC_CALL_DOC,
            "platforms": list(platforms), "model": cfg.model,
            "seq_len": seq_len, "n_cands": n_cands,
            "use_week_eval": bool(cfg.use_week_eval and eval_pop is not None)}


class PrepRecScorer:
    """A deserialized PREPRec serving artifact. `scores(...)` returns
    [b, C] candidate scores; `topk(..., k)` the top-k candidate COLUMN
    indices (positions in the submitted candidate list)."""

    def __init__(self, exported):
        self._exported = exported
        self._call = jax.jit(exported.call)

    def scores(self, seqs, t1, t2, cands, ct1, ct2, users=None) -> np.ndarray:
        seqs = jnp.asarray(seqs, jnp.int32)
        if users is None:
            users = jnp.zeros((seqs.shape[0],), jnp.int32)
        args = [seqs] + [jnp.asarray(a, jnp.int32)
                         for a in (t1, t2, cands, ct1, ct2, users)]
        return np.asarray(self._call(*args))

    def topk(self, seqs, t1, t2, cands, ct1, ct2, users=None, k: int = 10):
        s = self.scores(seqs, t1, t2, cands, ct1, ct2, users)
        order = np.argsort(-s, axis=1, kind="stable")
        return order[:, :k]

    @property
    def seq_len(self) -> int:
        return self._exported.in_avals[0].shape[1]

    @property
    def n_cands(self) -> int:
        return self._exported.in_avals[3].shape[1]


def load_candidate_scorer(path: str) -> PrepRecScorer:
    """Load an artifact written by `export_candidate_scorer`; needs only
    jax/jaxlib — no model code, checkpoint, or popularity files."""
    from jax import export as jexport

    with open(path, "rb") as fh:
        return PrepRecScorer(jexport.deserialize(bytearray(fh.read())))
