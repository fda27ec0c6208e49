"""PREPRec training driver (reference: `repo-b/train_test.py`).

Per-model loss branches, validation every `epoch_test` epochs with
NDCG@topk[0] early stopping (patience `stop_early`), periodic +
best checkpoints, final test from the best state, zero/few-shot
transfer. Epochs run as single jitted scans over device-resident data;
see `sampler.py` for batch semantics.

Divergences from the reference, on purpose:
- `model.py:181`'s `mod_time2 = time1_seqs[:,1:]` (month times reused
  for the week table when prev_time=False) is implemented correctly
  with `time2_seqs[:,1:]`. Set BSAREC_PREPREC_QUIRK186=1 to reproduce
  the reference's bugged gather (pos/neg week popularity indexed by
  month periods) — used to attribute the reference's slower per-epoch
  convergence in the same-machine head-to-head
  (results/r5_runs/headtohead_preprec_plateau.md).
- NewB4Rec's sampled-softmax target appends the true *label* item
  rather than the (possibly masked-to-0) input token (`model.py:382`).
"""

from __future__ import annotations

import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bsarec_tpu.preprec.config import PrepRecConfig, PrepRecTrainConfig
from bsarec_tpu.preprec.data import PrepRecDataset
from bsarec_tpu.preprec.evaluate import (
    build_eval_inputs,
    grouped_metrics,
    make_eval_fn,
    metrics_from_ranks,
)
from bsarec_tpu.preprec.models import PREPREC_REGISTRY
from bsarec_tpu.preprec.sampler import (
    augment_batch,
    cloze_mask,
    draw_user_batches,
    newb4rec_candidates,
    permute_user_items,
    positional_negatives,
)
from bsarec_tpu.train import checkpoint as ckpt


def masked_pair_bce(pos_logits, neg_logits, valid):
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    pos = jnp.sum(jax.nn.softplus(-pos_logits) * valid) / denom
    neg = jnp.sum(jax.nn.softplus(neg_logits) * valid) / denom
    return pos + neg


class PrepRecTrainer:
    def __init__(
        self,
        cfg: PrepRecConfig,
        tcfg: PrepRecTrainConfig,
        dataset: PrepRecDataset,
        logger,
        write_dir: str,
        pop_enc=None,
        eval_pop=None,
        usernegs: np.ndarray | None = None,
        user_feat: np.ndarray | None = None,  # [F, U] trajectory features for reg loss
    ):
        self.cfg, self.tcfg, self.ds = cfg, tcfg, dataset
        self.logger, self.write_dir = logger, write_dir
        self.pop_enc, self.eval_pop = pop_enc, eval_pop
        self.usernegs = usernegs
        os.makedirs(write_dir, exist_ok=True)

        self.model = PREPREC_REGISTRY[cfg.model](cfg)
        self.rng = jax.random.PRNGKey(tcfg.seed)
        self.np_rng = np.random.default_rng(tcfg.seed)

        self.params = self._init_params()
        # torch.optim.Adam(lr, betas=(0.9, 0.98), weight_decay=wd)
        # (`train_test.py:12-14`)
        chain = []
        if tcfg.wd:
            chain.append(optax.add_decayed_weights(tcfg.wd))
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-8))
        chain.append(optax.scale(-tcfg.lr))
        self.tx = optax.chain(*chain)
        self.opt_state = self.tx.init(self.params)

        self.num_batch = dataset.usernum // tcfg.batch_size
        self._dev = {
            "train_seq": jnp.asarray(dataset.train_seq),
            "train_t1": jnp.asarray(dataset.train_t1),
            "train_t2": jnp.asarray(dataset.train_t2),
            "train_te": jnp.asarray(dataset.train_te),
        }
        self.user_feat = None if user_feat is None else jnp.asarray(user_feat.T)  # [U, F]
        self._epoch_fn = self._build_epoch_fn()
        self._eval_arrays = {}
        self._eval_fn = None
        self._score_fn = None

    # ---- init -----------------------------------------------------------
    def _init_params(self):
        cfg = self.cfg
        key = jax.random.PRNGKey(0)
        b, t = 2, cfg.maxlen
        ids = jnp.ones((b, t), jnp.int32)
        feats_dim = cfg.input_units1 + cfg.input_units2
        feats = jnp.zeros((b, t, feats_dim))
        rngs = {"params": key, "dropout": key}
        name = cfg.model
        if name == "newrec":
            variables = self.model.init(
                rngs, feats, ids == 0, feats, feats,
                ids if cfg.time_embed else None, train=False,
            )
            # embed_layer.fc1.bias zero-init (repo-b/main.py:126-131)
            variables = jax.tree_util.tree_map(lambda x: x, variables)
            params = variables["params"]
            params["embed_layer"]["fc1"]["bias"] = jnp.zeros_like(
                params["embed_layer"]["fc1"]["bias"]
            )
            return params
        if name == "newb4rec":
            cand = jnp.zeros((b, t, 3, feats_dim))
            return self.model.init(rngs, feats, ids > 0, cand, train=False)["params"]
        if name == "sasrec" or name == "cl4srec":
            if name == "cl4srec":
                return self.model.init(rngs, ids, ids, ids, ids, ids, train=False)["params"]
            return self.model.init(rngs, ids, ids, ids, train=False)["params"]
        if name == "bert4rec":
            return self.model.init(rngs, ids, train=False)["params"]
        if name == "bprmf":
            u = jnp.ones((b,), jnp.int32)
            return self.model.init(rngs, u, ids, ids, train=False)["params"]
        raise ValueError(name)

    # ---- per-model jitted epoch ------------------------------------------
    def _build_epoch_fn(self):
        cfg, tcfg = self.cfg, self.tcfg
        model, tx = self.model, self.tx
        pop = self.pop_enc
        itemnum = self.ds.itemnum
        maxlen = cfg.maxlen
        user_feat = self.user_feat

        def newrec_loss(params, users, key):
            rows = self._dev["train_seq"][users - 1]  # [B, L+1]
            t1 = jnp.maximum(0, self._dev["train_t1"][users - 1] - 1 - cfg.lag // 4)
            t2 = jnp.maximum(0, self._dev["train_t2"][users - 1] - cfg.lag)
            te = self._dev["train_te"][users - 1]
            seq, pos = rows[:, :-1], rows[:, 1:]
            neg = positional_negatives(key, rows, pos, itemnum)
            seq_feats = pop(seq, t1[:, :-1], t2[:, :-1])
            if cfg.prev_time:
                m1, m2 = t1[:, :-1], t2[:, :-1]
            else:
                m1, m2 = t1[:, 1:], t2[:, 1:]
            if os.environ.get("BSAREC_PREPREC_QUIRK186"):
                # reference model.py:181/186: pos/neg WEEK popularity is
                # gathered with MONTH periods (time1 passed as both)
                m2 = m1
            pos_feats, neg_feats = pop(pos, m1, m2), pop(neg, m1, m2)

            def loss_fn(p, dkey):
                pos_l, neg_l, feats = model.apply(
                    {"params": p}, seq_feats, seq == 0, pos_feats, neg_feats,
                    te if cfg.time_embed else None, train=True,
                    rngs={"dropout": dkey},
                )
                loss = 0.0
                if not cfg.only_reg:
                    loss = masked_pair_bce(pos_l, neg_l, (pos != 0).astype(jnp.float32))
                if (cfg.triplet_loss or cfg.cos_loss) and user_feat is not None:
                    # nearest/farthest in-batch users by trajectory distance
                    # (`train_test.py:93-101`, `model.py:241-269`)
                    f = user_feat[users - 1]  # [B, F]
                    d = jnp.sqrt(jnp.sum((f[:, None] - f[None]) ** 2, -1) + 1e-12)
                    _, pos_u = jax.lax.top_k(-d, cfg.reg_num)
                    _, neg_u = jax.lax.top_k(d, cfg.reg_num)
                    anchor = feats[:, -1, :]
                    pu, nu = anchor[pos_u], anchor[neg_u]  # [B, R, H]
                    if cfg.triplet_loss:
                        dp = jnp.linalg.norm(anchor[:, None] - pu, axis=-1)
                        dn = jnp.linalg.norm(anchor[:, None] - nu, axis=-1)
                        loss += cfg.reg_coef * jnp.mean(jnp.maximum(dp - dn, 0.0))
                    if cfg.cos_loss:
                        def cos(a, b):
                            num = jnp.sum(a * b, -1)
                            return num / (jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-12)
                        loss += cfg.reg_coef * jnp.mean(1 - cos(anchor[:, None], pu))
                        loss += cfg.reg_coef * jnp.mean(jnp.maximum(cos(anchor[:, None], nu), 0.0))
                return loss

            return loss_fn

        def sasrec_loss(params, users, key):
            rows = self._dev["train_seq"][users - 1]
            seq, pos = rows[:, :-1], rows[:, 1:]
            neg = positional_negatives(key, rows, pos, itemnum)

            def loss_fn(p, dkey):
                pos_l, neg_l = model.apply(
                    {"params": p}, seq, pos, neg, train=True, rngs={"dropout": dkey}
                )
                loss = masked_pair_bce(pos_l, neg_l, (pos != 0).astype(jnp.float32))
                if tcfg.l2_emb and "item_emb" in p:
                    # torch.norm(item_emb) per parameter: Frobenius norm,
                    # not squared (repo-b/train_test.py:58-59). The
                    # reference applies l2_emb only in its sasrec branch;
                    # models without an item table (newrec's popularity
                    # encoding) skip the term rather than KeyError.
                    emb = p["item_emb"]["embedding"]
                    loss = loss + tcfg.l2_emb * jnp.sqrt(jnp.sum(emb * emb))
                return loss

            return loss_fn

        def bert4rec_loss(params, users, key):
            rows = self._dev["train_seq"][users - 1][:, 1:]
            masked, labels = cloze_mask(key, rows, itemnum, cfg.mask_prob)

            def loss_fn(p, dkey):
                logits = model.apply({"params": p}, masked, train=True, rngs={"dropout": dkey})
                logits = logits.reshape(-1, logits.shape[-1])
                flat = labels.reshape(-1)
                logz = jax.nn.logsumexp(logits, axis=-1)
                gold = jnp.take_along_axis(logits, flat[:, None], axis=-1)[:, 0]
                valid = (flat != 0).astype(jnp.float32)
                return jnp.sum((logz - gold) * valid) / jnp.maximum(valid.sum(), 1.0)

            return loss_fn

        def newb4rec_loss(params, users, key):
            compare = max(itemnum // cfg.loss_size, 1)
            rows = self._dev["train_seq"][users - 1][:, 1:]
            t1 = self._dev["train_t1"][users - 1][:, 1:]
            t2 = self._dev["train_t2"][users - 1][:, 1:]
            mkey, ckey = jax.random.split(key)
            masked, labels = cloze_mask(mkey, rows, itemnum, cfg.mask_prob)
            # reference-exact gold column: the masked input token, not
            # the label (see sampler.newb4rec_candidates)
            cands = newb4rec_candidates(ckey, masked, itemnum, compare)
            ct1 = jnp.repeat(t1[..., None], compare + 1, axis=-1)
            ct2 = jnp.repeat(t2[..., None], compare + 1, axis=-1)
            seq_feats = pop(masked, t1, t2)
            cand_feats = pop(cands, ct1, ct2)

            def loss_fn(p, dkey):
                logits = model.apply(
                    {"params": p}, seq_feats, masked > 0, cand_feats,
                    train=True, rngs={"dropout": dkey},
                )  # raw [B, T, C]
                # reference-exact (`model.py:295,398` + `train_test.py:
                # 189-193`): LogSoftmax over the TIME axis (dim=1 of the
                # [B, T, C] tensor — a shape quirk, but it shifts each
                # candidate column differently so the CE that follows
                # does NOT cancel it), then CE over candidates with the
                # appended gold column (the masked input token — see the
                # candidate-construction comment above) as the target.
                x = logits - jax.nn.logsumexp(logits, axis=1, keepdims=True)
                logz = jax.nn.logsumexp(x, axis=-1)  # CE's own softmax
                gold = x[..., -1]
                valid = (labels != 0).astype(jnp.float32)
                return jnp.sum((logz - gold) * valid) / jnp.maximum(valid.sum(), 1.0)

            return loss_fn

        def bprmf_loss(params, users, key):
            pkey, nkey = jax.random.split(key)
            rows = self._dev["train_seq"][users - 1]
            pos = permute_user_items(pkey, rows)
            neg = positional_negatives(nkey, rows, pos, itemnum)

            def loss_fn(p, dkey):
                pos_l, neg_l = model.apply({"params": p}, users, pos, neg, train=True)
                valid = pos != 0
                # reference sums (train_test.py:211)
                return -jnp.sum(jnp.where(valid, jax.nn.log_sigmoid(pos_l - neg_l), 0.0))

            return loss_fn

        loss_builders = {
            "newrec": newrec_loss,
            "sasrec": sasrec_loss,
            "bert4rec": bert4rec_loss,
            "newb4rec": newb4rec_loss,
            "bprmf": bprmf_loss,
        }

        if cfg.model == "cl4srec":
            def epoch_cl4(params, opt_state, key, user_mat, aug1, aug2):
                def body(carry, xs):
                    params, opt_state, loss_sum = carry
                    users, a1, a2, step = xs
                    skey = jax.random.fold_in(key, step)
                    nkey, dkey = jax.random.split(skey)
                    rows = self._dev["train_seq"][users - 1]
                    seq, pos = rows[:, :-1], rows[:, 1:]
                    neg = positional_negatives(nkey, rows, pos, itemnum)

                    def loss_fn(p):
                        pos_l, neg_l, aug = model.apply(
                            {"params": p}, seq, a1, a2, pos, neg,
                            train=True, rngs={"dropout": dkey},
                        )
                        bce = masked_pair_bce(pos_l, neg_l, (pos != 0).astype(jnp.float32))
                        return bce + cfg.aug_coef * aug

                    loss, grads = jax.value_and_grad(loss_fn)(params)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state, loss_sum + loss), None

                steps = user_mat.shape[0]
                (params, opt_state, loss_sum), _ = jax.lax.scan(
                    body, (params, opt_state, 0.0),
                    (user_mat, aug1, aug2, jnp.arange(steps)),
                )
                return params, opt_state, loss_sum / steps

            return jax.jit(epoch_cl4, donate_argnums=(0, 1))

        builder = loss_builders[cfg.model]

        def epoch(params, opt_state, key, user_mat):
            def body(carry, xs):
                params, opt_state, loss_sum = carry
                users, step = xs
                skey = jax.random.fold_in(key, step)
                nkey, dkey = jax.random.split(skey)
                loss_fn = builder(params, users, nkey)
                loss, grads = jax.value_and_grad(lambda p: loss_fn(p, dkey))(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, loss_sum + loss), None

            steps = user_mat.shape[0]
            (params, opt_state, loss_sum), _ = jax.lax.scan(
                body, (params, opt_state, 0.0), (user_mat, jnp.arange(steps))
            )
            return params, opt_state, loss_sum / steps

        return jax.jit(epoch, donate_argnums=(0, 1))

    # ---- API --------------------------------------------------------------
    def train_epoch(self) -> float:
        steps = max(int(self.num_batch * self.tcfg.fs_prop), 1)
        users = draw_user_batches(
            self.np_rng, self.ds.eligible_users, steps, self.tcfg.batch_size
        )
        key, self.rng = jax.random.split(self.rng)
        if self.cfg.model == "cl4srec":
            rows = self.ds.train_seq[users - 1][:, :, :-1]
            lens = self.ds.seq_lens[users - 1] - 1  # seq excludes last target
            flat = rows.reshape(-1, rows.shape[-1])
            a1, a2 = augment_batch(self.np_rng, flat, np.maximum(lens.reshape(-1), 0))
            a1 = a1.reshape(rows.shape)
            a2 = a2.reshape(rows.shape)
            self.params, self.opt_state, loss = self._epoch_fn(
                self.params, self.opt_state, key, jnp.asarray(users),
                jnp.asarray(a1), jnp.asarray(a2),
            )
        else:
            self.params, self.opt_state, loss = self._epoch_fn(
                self.params, self.opt_state, key, jnp.asarray(users)
            )
        return float(loss)

    def _eval_batch(self) -> int:
        """Configured eval scoring batch (`--eval_batch_size`); 0 picks
        the memory-safe default per eval method (full-catalog scoring
        streams [batch, item_chunk] candidate tiles)."""
        if self.tcfg.eval_batch_size > 0:
            return self.tcfg.eval_batch_size
        return 64 if self.cfg.eval_method != 3 else 32

    def _eval(self, mode: str):
        if mode not in self._eval_arrays:
            inputs = build_eval_inputs(self.ds, self.cfg, mode, self.usernegs)
            keys = ["seqs", "t1", "t2", "te", "target", "cand_t1", "cand_t2", "users"]
            if inputs.cands is not None:
                keys.append("cands")  # absent => implicit full-catalog sweep
            self._eval_arrays[mode] = {
                k: jnp.asarray(getattr(inputs, k)) for k in keys
            }
            if self.pop_enc is not None:
                # tables enter the jitted eval as runtime arguments —
                # closed over they bake into the lowered module as
                # constants, which at production catalog scale exceeds
                # the remote compiler's upload limit (evaluate.py:_build)
                self._eval_arrays[mode]["pop_month"] = self.pop_enc.month.table
                self._eval_arrays[mode]["pop_week"] = self.pop_enc.week.table
        # one cached fn is enough: make_eval_fn closes over batch and
        # num_users only, and the jitted callable retraces per input
        # shape — an eval_method 1<->3 switch (different candidate count
        # C) just compiles a second specialization of the same fn
        if self._eval_fn is None:
            batch = self._eval_batch()
            self._eval_fn, _ = make_eval_fn(
                self.model, self.cfg, self.pop_enc, self.eval_pop, batch,
                self.ds.usernum, self.ds.itemnum,
                item_chunk=self.tcfg.eval_item_chunk,
            )
        key, self.rng = jax.random.split(self.rng)
        ranks = np.asarray(self._eval_fn(self.params, key, self._eval_arrays[mode]))
        return ranks

    def evaluate(self, mode: str, userpop: np.ndarray | None = None):
        ranks = self._eval(mode)
        metrics = metrics_from_ranks(ranks, self.cfg.topk)
        if self.cfg.eval_quality and userpop is not None:
            self.logger.info(str(grouped_metrics(ranks, userpop, self.cfg)))
        return metrics, ranks

    def eval_scores(self, mode: str) -> np.ndarray:
        """Raw [U, C] candidate scores (reference --save_scores,
        `repo-b/utils.py:522,546,559`: writescores dumped per mode)."""
        if mode not in self._eval_arrays:
            self._eval(mode)  # builds arrays (ranks discarded)
        if self._score_fn is None:  # cache: compiles are expensive here
            batch = self._eval_batch()
            self._score_fn, _ = make_eval_fn(
                self.model, self.cfg, self.pop_enc, self.eval_pop, batch,
                self.ds.usernum, self.ds.itemnum, return_scores=True,
                item_chunk=self.tcfg.eval_item_chunk,
            )
        key, self.rng = jax.random.split(self.rng)
        return np.asarray(self._score_fn(self.params, key, self._eval_arrays[mode]))

    def user_embeddings(self, mode: str, batch: int = 512) -> np.ndarray:
        """[U, H] final encoder states — the transferable user
        representation PREPRec exports for downstream use (reference
        `newrec_user`, `repo-b/utils.py:575-621` / `model.py:206`).
        Batched: the per-block activations are [batch, L, H], so this
        scales to production user counts (an unbatched pass would be
        O(U x L x H) device memory)."""
        assert self.cfg.model == "newrec"
        if mode not in self._eval_arrays:
            self._eval(mode)
        arrays = self._eval_arrays[mode]

        @jax.jit
        def embed(params, seqs, t1, t2, te):
            feats = self.pop_enc(seqs, t1, t2)
            out = self.model.apply(
                {"params": params}, feats, seqs == 0,
                te if self.cfg.time_embed else None, method="encode",
            )
            return out[:, -1, :]

        n = self.ds.usernum
        chunks = []
        for lo in range(0, n, batch):
            hi = min(lo + batch, n)
            # pad the tail chunk to the full batch so one jit program serves
            # every chunk (recompiles are minutes on 1-core hosts)
            idx = np.arange(lo, lo + batch) % n
            out = embed(
                self.params, arrays["seqs"][idx], arrays["t1"][idx],
                arrays["t2"][idx], arrays["te"][idx],
            )
            chunks.append(np.asarray(out)[: hi - lo])
        return np.concatenate(chunks, axis=0)

    def adopt(self, other: "PrepRecTrainer"):
        """Take over another trainer's parameters + optimizer state.
        NewRec has no dataset-specific parameters (popularity/positional
        tables live outside the param tree), so the trees match and
        dual-dataset training reduces to handing the same state back and
        forth (the reference swaps filtered state_dicts each epoch,
        `repo-b/train_test.py:132-171`)."""
        self.params = other.params
        self.opt_state = other.opt_state

    def fit(self, userpop=None, second: "PrepRecTrainer | None" = None):
        """Train with periodic eval + early stop; when `second` is given,
        each epoch alternates dataset-1 and dataset-2 batches through the
        SAME parameters (concurrent dual-dataset training — the
        capability of `repo-b/train_test.py:132-171`, realized without
        the reference's per-epoch state-dict swap dance)."""
        cfg, tcfg = self.cfg, self.tcfg
        # best_params must be a HOST snapshot: the jitted epoch fns
        # donate self.params (donate_argnums), so a live reference to
        # the old device buffers is deleted after the next epoch —
        # real on TPU, silently a no-op on the CPU test backend
        best_ndcg, best_params, stop = 0.0, jax.device_get(self.params), 0
        mode = "valid" if not cfg.sparse or cfg.override_sparse else "test"
        if tcfg.first_eval:  # repo-b/train_test.py:29-33
            m0, _ = self.evaluate(mode, userpop)
            self.logger.info(f"pre-train {mode}: {m0}")
        for epoch in range(1, tcfg.num_epochs + 1):
            t0 = time.time()
            loss = self.train_epoch()
            if second is not None:
                second.adopt(self)
                loss2 = second.train_epoch()
                self.adopt(second)
                self.logger.info(f"epoch {epoch} dataset-2 loss {loss2:.4f}")
            self.logger.info(
                f"epoch {epoch}: loss {loss:.4f} ({time.time() - t0:.2f}s)"
            )
            if epoch % tcfg.epoch_test == 0:
                metrics, _ = self.evaluate(mode, userpop)
                ndcg, hr = metrics[0]
                self.logger.info(
                    f"epoch {epoch} {mode}: NDCG@{cfg.topk[0]} {ndcg}, HR@{cfg.topk[0]} {hr}"
                )
                if second is not None:
                    m2, _ = second.evaluate(mode)
                    self.logger.info(f"epoch {epoch} {mode} dataset-2: {m2}")
                ckpt.save_params(self.params, os.path.join(self.write_dir, f"epoch={epoch}.ckpt"))
                if ndcg > best_ndcg:
                    best_ndcg, best_params, stop = (
                        ndcg, jax.device_get(self.params), 0
                    )
                else:
                    stop += 1
            if stop >= tcfg.stop_early:
                break
        if best_ndcg > 0:
            ckpt.save_params(best_params, os.path.join(self.write_dir, "best.ckpt"))
            if not tcfg.state_override:  # repo-b/train_test.py:290-293
                self.params = jax.device_put(best_params)
        if tcfg.train_only:  # repo-b/train_test.py:284
            return None, None
        metrics, ranks = self.evaluate("test", userpop)
        for (ndcg, hr), k in zip(metrics, cfg.topk):
            self.logger.info(f"Test NDCG@{k}: {ndcg}, HR@{k}: {hr}")
        return metrics, ranks

    # ---- transfer (zero/few-shot) ----------------------------------------
    def load_transfer(self, path: str):
        """Load weights trained on another domain. Popularity tables and
        fixed positional tables are not parameters in this design, so a
        checkpoint transfers as-is (reference drops those buffers
        explicitly, `repo-b/main.py:158-160`). Loading is PARTIAL, like
        the reference's `model_dict.update(loaded)` (`repo-b/main.py:161-163`):
        params absent from the checkpoint (e.g. a fresh fs_layer) keep
        their init values. With `fs_emb`, everything except the few-shot
        adapter then freezes (`repo-b/main.py:164-170`)."""
        import flax

        with open(path, "rb") as fh:
            raw = flax.serialization.msgpack_restore(fh.read())

        def merge(tpl, new):
            if isinstance(tpl, dict):
                return {
                    k: merge(v, new[k]) if k in new else v
                    for k, v in tpl.items()
                }
            assert tpl.shape == new.shape, (tpl.shape, new.shape)
            return jnp.asarray(new, tpl.dtype)

        self.params = merge(self.params, raw)
        if self.cfg.fs_emb:
            def frozen(path, _):
                return not any(
                    str(getattr(k, "key", k)) == "fs_layer" for k in path
                )

            not_fs = jax.tree_util.tree_map_with_path(frozen, self.params)
            # zero the FINAL updates of frozen params (weight decay
            # included), matching requires_grad=False semantics
            self.tx = optax.chain(
                self.tx, optax.masked(optax.set_to_zero(), not_fs)
            )
            self._epoch_fn = self._build_epoch_fn()
        self.opt_state = self.tx.init(self.params)
