"""Trainer orchestration.

Mirrors the reference `Trainer` surface (`src/trainers.py:9-60`):
`train(epoch)` / `valid(epoch)` / `test(epoch)` / `save` / `load`,
plus a `fit()` driver implementing `src/main.py:51-64` (early stop on
NDCG@20, reload best checkpoint, final test). Under the hood each
epoch / eval pass is one jitted scan (see `train/loop.py`).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from bsarec_tpu.config import ModelConfig, TrainConfig
from bsarec_tpu.core import mesh as meshlib
from bsarec_tpu.data.pipeline import SeqRecData
from bsarec_tpu.models import build_model
from bsarec_tpu.ops.topk import metrics_from_sums
from bsarec_tpu.train import checkpoint as ckpt
from bsarec_tpu.train.loop import build_eval_fn, build_train_epoch, make_optimizer
from bsarec_tpu.utils.early_stopping import EarlyStopping
from bsarec_tpu.utils.profiling import Throughput, annotate

CONTRASTIVE_MODELS = ("duorec", "fearec")


class Trainer:
    def __init__(
        self,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig,
        data: SeqRecData,
        logger,
        checkpoint_path: str = "output/model.ckpt",
    ):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.data = data
        self.logger = logger
        self.checkpoint_path = checkpoint_path
        self.with_sem = model_cfg.model_type.lower() in CONTRASTIVE_MODELS

        # optional multi-device mesh: data-parallel dense tower, vocab-
        # sharded item table (+ Adam moments following their params)
        mesh_cfg = meshlib.parse_mesh_spec(train_cfg.mesh)
        self.mesh = meshlib.make_mesh(mesh_cfg) if mesh_cfg else None

        # pallas_call has no SPMD partitioning rule, so when the item
        # table is vocab-sharded the streaming kernels run per-shard
        # inside shard_map ("sharded_streaming", parallel/logits.py)
        # instead of being left to the auto-partitioner; "dense" stays
        # the small-catalog / CPU default exactly as in the unsharded
        # "auto" policy
        self._vocab_sharded = bool(
            self.mesh is not None
            and self.mesh.shape[meshlib.MODEL_AXIS] > 1
            and model_cfg.item_size % self.mesh.shape[meshlib.MODEL_AXIS] == 0
        )
        if self._vocab_sharded:
            import dataclasses as _dc

            from bsarec_tpu.ops.losses import STREAMING_CE_MIN_VOCAB

            meshlib.set_active_mesh(self.mesh)
            # BERT4Rec's [mask] row makes its table (item_size + 1)
            # rows — not row-shardable when item_size % m == 0 — so it
            # keeps the dense paths (its table replicates anyway,
            # see _apply_placement)
            shardable = model_cfg.model_type.lower() != "bert4rec"
            big = (
                model_cfg.item_size >= STREAMING_CE_MIN_VOCAB
                and jax.default_backend() == "tpu"
            )

            def mesh_impl(requested: str) -> str:
                if not shardable or requested == "dense":
                    return "dense"
                if requested == "streaming" or (requested == "auto" and big):
                    return "sharded_streaming"
                return "dense"

            model_cfg = model_cfg.replace(loss_impl=mesh_impl(model_cfg.loss_impl))
            self.model_cfg = model_cfg
            train_cfg = _dc.replace(
                train_cfg, eval_impl=mesh_impl(train_cfg.eval_impl)
            )
            self.train_cfg = train_cfg

        self.model = build_model(model_cfg)
        self.rng = jax.random.PRNGKey(train_cfg.seed)
        self.np_rng = np.random.default_rng(train_cfg.seed)

        init_rng, self.rng = jax.random.split(self.rng)
        dummy = jnp.zeros((2, model_cfg.max_seq_length), jnp.int32)
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng}, dummy, train=False
        )
        self.params = variables["params"]
        self.tx = make_optimizer(train_cfg)
        if self.mesh is not None:
            self.params = self._apply_placement(self.params)
            self.opt_state = jax.jit(self.tx.init)(self.params)
            logger.info(f"mesh: {dict(self.mesh.shape)}")
        else:
            self.opt_state = self.tx.init(self.params)

        n_params = sum(x.size for x in jax.tree.leaves(self.params))
        logger.info(f"Total Parameters: {n_params}")

        import math as _math

        self.steps_per_epoch = _math.ceil(
            data.train.num_samples / train_cfg.batch_size
        )
        if train_cfg.multihost:
            # host-fed pipeline: the training set never materializes in
            # HBM; each step's global batch assembles from per-process
            # slices (data/multihost.py). Schedule is bit-equal to the
            # scan path's (same PRNG stream, same wrap-padding).
            from bsarec_tpu.data.multihost import HostShardedDataset
            from bsarec_tpu.train.loop import build_train_step

            self._host_ds = HostShardedDataset(
                {
                    "input_ids": data.train.input_ids,
                    "answers": data.train.answers,
                    "user_ids": data.train.user_ids,
                },
                train_cfg.batch_size,
                train_cfg.seed,
            )
            self._step_fn = build_train_step(
                self.model, self.tx, model_cfg.item_size, self.with_sem,
                mesh=self.mesh, remat=train_cfg.remat,
            )
            self._train_dev = None
            self._epoch_fn = None
        else:
            # datasets live in HBM for the whole run
            self._train_dev = {
                "inputs": jnp.asarray(data.train.input_ids),
                "answers": jnp.asarray(data.train.answers),
                "users": jnp.asarray(data.train.user_ids),
            }
            from bsarec_tpu.ops.losses import STREAMING_CE_MIN_VOCAB
            from bsarec_tpu.train.loop import resolve_scan_unroll

            dense_loss = not (
                model_cfg.loss_impl in ("streaming", "sharded_streaming")
                or (
                    model_cfg.loss_impl == "auto"
                    and model_cfg.item_size >= STREAMING_CE_MIN_VOCAB
                    and jax.default_backend() == "tpu"
                )
            )
            unroll, est = resolve_scan_unroll(
                train_cfg.scan_unroll, model_cfg, train_cfg.batch_size,
                dense_loss=dense_loss,
            )
            if train_cfg.scan_unroll == 0 and unroll < 8:
                logger.info(
                    f"scan_unroll auto-downshifted to {unroll} "
                    f"(~{est >> 20} MiB residuals per step body; pass "
                    f"--scan_unroll to override)"
                )
            self._epoch_fn, self.steps_per_epoch = build_train_epoch(
                self.model,
                self.tx,
                model_cfg.item_size,
                train_cfg.batch_size,
                data.train.num_samples,
                self.with_sem,
                mesh=self.mesh,
                unroll=unroll,
                remat=train_cfg.remat,
            )
        from bsarec_tpu.ops.pallas_rank import (
            SEEN_BITMASK_STAGE_LIMIT,
            TILE_COLS,
        )

        # streaming eval stages one [U, Vp/32] bitmask per split; above
        # the limit keep the tiny [U, S] id lists resident and build
        # each batch's bitmask on device instead (1M items x 50k users
        # would stage 2 x 6.25 GB and OOM the chip)
        vp_words = -(-model_cfg.item_size // TILE_COLS) * TILE_COLS // 32
        staged_bytes = 2 * data.valid.num_users * vp_words * 4
        self._seen_format = (
            "ids" if staged_bytes > SEEN_BITMASK_STAGE_LIMIT else "bitmask"
        )
        self._eval_fn, _, self.eval_impl = build_eval_fn(
            self.model,
            model_cfg.item_size,
            train_cfg.eval_batch_size,
            data.valid.num_users,
            impl=train_cfg.eval_impl,
            mesh=self.mesh,
            dtype=model_cfg.compute_dtype,
            seen_format=self._seen_format,
        )

        self._eval_dev = {}
        for split_name in ("valid", "test"):
            split = getattr(data, split_name)
            if self.eval_impl == "streaming" and self._seen_format == "ids":
                from bsarec_tpu.ops.pallas_rank import dedupe_seen_rows

                seen = dedupe_seen_rows(split.seen_items)
                if split_name == "valid":
                    logger.info(
                        f"eval seen masks: on-device per-batch bitmasks "
                        f"(staging both splits would take "
                        f"{staged_bytes >> 20} MiB)"
                    )
            elif self.eval_impl == "streaming":
                from bsarec_tpu.ops.pallas_rank import build_seen_bitmask

                seen = build_seen_bitmask(split.seen_items, model_cfg.item_size)
            elif self.eval_impl == "sharded_streaming":
                from bsarec_tpu.ops.pallas_rank import build_seen_bitmask_sharded

                seen = build_seen_bitmask_sharded(
                    split.seen_items,
                    model_cfg.item_size,
                    self.mesh.shape[meshlib.MODEL_AXIS],
                )
            else:
                seen = split.seen_items
            self._eval_dev[split_name] = {
                "inputs": jnp.asarray(split.input_ids),
                "answers": jnp.asarray(split.answers),
                "seen": jnp.asarray(seen),
            }
        self._zero_sem = jnp.zeros((data.train.num_samples, 0), jnp.int32)
        # early-stopping state restored by resume(), consumed by fit()
        self._resume_stopper: tuple | None = None

    def _apply_placement(self, params):
        """Device-put `params` with the run's NamedShardings: vocab-shard
        the item table over the model axis, replicate everything else.
        Used at init AND after resume (restored host arrays would
        otherwise silently lose their mesh placement)."""
        vocab = meshlib.vocab_sharding(self.mesh)
        repl = meshlib.replicated(self.mesh)

        def placement(path, leaf):
            keys = tuple(str(getattr(k, "key", k)) for k in path)
            shard_vocab = (
                "item_embeddings" in keys
                # _vocab_sharded also gates the loss/eval impl choice;
                # keep both decisions identical. Row-sharding needs the
                # table rows divisible by the axis (BERT4Rec's +1 mask
                # row can differ from item_size); small catalogs just
                # replicate — the table fits everywhere
                and self._vocab_sharded
                and leaf.shape[0] % self.mesh.shape[meshlib.MODEL_AXIS] == 0
            )
            return vocab if shard_vocab else repl

        shardings = jax.tree_util.tree_map_with_path(placement, params)
        return jax.tree.map(jax.device_put, params, shardings)

    def _train_multihost(self, epoch: int) -> float:
        """One epoch through the host-fed pipeline. The PRNG stream
        (epoch key -> perm_key + step fold_ins) replays
        `train/loop.py:build_train_epoch`'s exactly, so the loss
        trajectory matches the HBM-resident scan at process_count=1."""
        from bsarec_tpu.data.multihost import global_batch

        key, self.rng = jax.random.split(self.rng)
        if self.with_sem:
            self._host_ds.fields["same_target"] = np.asarray(
                self.data.sample_same_target(self.np_rng)
            )
        perm_key, key = jax.random.split(key)
        n = self.data.train.num_samples
        perm = np.asarray(jax.random.permutation(perm_key, n))
        padded = self.steps_per_epoch * self.train_cfg.batch_size
        if padded != n:
            perm = np.concatenate([perm, perm[: padded - n]])
        loss_sum = None
        for s, local in enumerate(self._host_ds.epoch_batches_from_perm(perm)):
            if self.mesh is not None:
                batch = global_batch(
                    local, self.mesh, self.train_cfg.batch_size
                )
            else:
                batch = {k: jnp.asarray(v) for k, v in local.items()}
            step_key = jax.random.fold_in(key, s)
            self.params, self.opt_state, loss = self._step_fn(
                self.params, self.opt_state, step_key, batch
            )
            loss_sum = loss if loss_sum is None else loss_sum + loss
        loss = float(loss_sum) / self.steps_per_epoch
        if (epoch + 1) % self.train_cfg.log_freq == 0:
            self.logger.info(str({"epoch": epoch, "rec_loss": f"{loss:.4f}"}))
        return loss

    # ---- reference-API surface -----------------------------------------
    def train(self, epoch: int) -> float:
        if self.train_cfg.multihost:
            return self._train_multihost(epoch)
        key, self.rng = jax.random.split(self.rng)
        if self.with_sem:
            sem = jnp.asarray(self.data.sample_same_target(self.np_rng))
        else:
            sem = self._zero_sem
        self.params, self.opt_state, loss = self._epoch_fn(
            self.params,
            self.opt_state,
            key,
            self._train_dev["inputs"],
            self._train_dev["answers"],
            self._train_dev["users"],
            sem,
        )
        loss = float(loss)
        if (epoch + 1) % self.train_cfg.log_freq == 0:
            self.logger.info(str({"epoch": epoch, "rec_loss": f"{loss:.4f}"}))
        return loss

    def _evaluate(self, split: str, epoch: int):
        dev = self._eval_dev[split]
        sums = self._eval_fn(self.params, dev["inputs"], dev["answers"], dev["seen"])
        metrics = metrics_from_sums(np.asarray(sums))
        post_fix = {"Epoch": epoch}
        for k in (5, 10, 20):
            post_fix[f"HR@{k}"] = f"{metrics[f'HR@{k}']:.4f}"
            post_fix[f"NDCG@{k}"] = f"{metrics[f'NDCG@{k}']:.4f}"
        self.logger.info(str(post_fix))
        scores = [
            metrics["HR@5"], metrics["NDCG@5"],
            metrics["HR@10"], metrics["NDCG@10"],
            metrics["HR@20"], metrics["NDCG@20"],
        ]
        return scores, str(post_fix)

    def valid(self, epoch: int):
        return self._evaluate("valid", epoch)

    def test(self, epoch: int):
        return self._evaluate("test", epoch)

    def export_topk(self, split: str = "test") -> np.ndarray:
        """Serving export: [num_users, 20] top-k item ids per user —
        full-catalog scoring, seen-items masked, the exact ranking the
        HR/NDCG metrics are computed from (`--export_topk`). Built on
        demand; reuses the eval arrays already resident in HBM."""
        fn, _, _ = build_eval_fn(
            self.model,
            self.model_cfg.item_size,
            self.train_cfg.eval_batch_size,
            self.data.valid.num_users,
            impl=self.train_cfg.eval_impl,
            mesh=self.mesh,
            dtype=self.model_cfg.compute_dtype,
            collect_topk=True,
            seen_format=self._seen_format,
        )
        dev = self._eval_dev[split]
        return np.asarray(fn(self.params, dev["inputs"], dev["answers"], dev["seen"]))

    def dump_sequence_outputs(self, out_dir: str, tag: str,
                              split: str = "test",
                              batch_size: int | None = None) -> int:
        """Reference-layout per-layer sequence-output dumps
        (`<out_dir>/<tag>/{L}layer_{i}iter.npy` — the input format of the
        reference's `src/visualize/figure3.ipynb` / its shipped
        `sequence_output/` dirs): eval-mode all-layers forwards over the
        <split> inputs, one file set per eval batch (`--dump_seqout`).
        Returns the number of batches written."""
        from bsarec_tpu.utils.visualize import dump_sequence_outputs as _dump

        b = batch_size or self.train_cfg.eval_batch_size
        split_data = self.data.test if split == "test" else self.data.valid
        inputs = np.asarray(split_data.input_ids)
        fwd = jax.jit(lambda p, x: self.model.apply(
            {"params": p}, x, train=False, all_layers=True))
        n_batches = (len(inputs) + b - 1) // b
        for i in range(n_batches):
            batch = inputs[i * b:(i + 1) * b]
            valid = len(batch)
            if valid < b:  # pad to the compiled shape, slice after
                batch = np.pad(batch, ((0, b - valid), (0, 0)))
            outs = fwd(self.params, jnp.asarray(batch))
            _dump([np.asarray(o)[:valid] for o in outs], out_dir, tag, i)
        return n_batches

    def save(self, path: str | None = None):
        ckpt.save_params(self.params, path or self.checkpoint_path)

    def load(self, path: str | None = None, filter_fn=None):
        self.install_params(
            ckpt.load_params(self.params, path or self.checkpoint_path, filter_fn)
        )

    def install_params(self, params):
        """Adopt an externally-produced host param tree (checkpoint
        restore, torch import). Same rule as resume(): host arrays must
        get their mesh placement back, or the final test would run with
        a replicated (unsharded) item table — fatal at 10M-item scale."""
        if self.mesh is not None:
            params = self._apply_placement(params)
        self.params = params

    # ---- crash recovery (beyond the reference: SURVEY.md §5) -------------
    @property
    def state_path(self) -> str:
        return self.checkpoint_path + ".state"

    def _config_fingerprint(self) -> str:
        """The model architecture as canonical JSON. `loss_impl` is
        excluded: its choices are numerically equivalent implementations
        and the trainer legitimately rewrites it per mesh context."""
        import dataclasses
        import json

        fields = dataclasses.asdict(self.model_cfg)
        fields.pop("loss_impl", None)
        return json.dumps(fields, sort_keys=True)

    def save_state(self, epoch: int, stopper: EarlyStopping | None = None):
        ckpt.save_train_state(
            self.state_path, self.params, self.opt_state, epoch, self.rng,
            best_score=None if stopper is None else stopper.best_score,
            patience_counter=0 if stopper is None else stopper.counter,
            config_fp=self._config_fingerprint(),
        )

    def resume(self) -> int:
        """Restore params/optimizer/PRNG/early-stop state from the latest
        state snapshot; returns the next epoch to run."""
        (self.params, self.opt_state, epoch, self.rng,
         best_score, counter, saved_fp) = ckpt.load_train_state(
            self.state_path, self.params, self.opt_state, self.rng
        )
        if saved_fp is not None and saved_fp != self._config_fingerprint():
            import json

            saved = json.loads(saved_fp)
            here = json.loads(self._config_fingerprint())
            diff = {
                k: (saved.get(k), here.get(k))
                for k in sorted(set(saved) | set(here))
                if saved.get(k) != here.get(k)
            }
            raise ValueError(
                f"--resume model config does not match the snapshot at "
                f"{self.state_path} (snapshot vs now): {diff}. Omitted CLI "
                f"flags fall back to defaults — re-pass the original run's "
                f"flags (param shapes matching is NOT enough: e.g. a "
                f"num_attention_heads change keeps every shape identical)."
            )
        if self.mesh is not None:
            # restored host arrays must get their mesh placement back, or
            # the vocab-sharded table silently replicates post-resume.
            # Adam's mu/nu mirror the param paths, so the same placement
            # rule shards the moments of the item table too.
            self.params = self._apply_placement(self.params)
            self.opt_state = self._apply_placement(self.opt_state)
        self._resume_stopper = (best_score, counter)
        self.logger.info(f"resumed full train state from {self.state_path} (epoch {epoch})")
        return epoch + 1

    # ---- full run (reference: src/main.py:51-64) ------------------------
    def fit(self, start_epoch: int = 0):
        stopper = EarlyStopping(
            save_fn=lambda _: self.save(),
            logger=self.logger,
            patience=self.train_cfg.patience,
        )
        if self._resume_stopper is not None:
            stopper.best_score, stopper.counter = self._resume_stopper
            self._resume_stopper = None
        tput = Throughput()
        for epoch in range(start_epoch, self.train_cfg.epochs):
            tput.start()
            with annotate("train_epoch"):
                self.train(epoch)
            rate = tput.stop(self.data.train.num_samples)
            t1 = time.time()
            with annotate("eval_epoch"):
                scores, _ = self.valid(epoch)
            t2 = time.time()
            self.logger.info(
                f"epoch {epoch}: train {rate:.0f} ex/s, eval {t2 - t1:.2f}s"
            )
            stopper(np.array(scores[-1:]), None)
            self.save_state(epoch, stopper)
            if stopper.early_stop:
                self.logger.info("Early stopping")
                break
        if tput.steady_rate:
            self.logger.info(f"steady-state train throughput: {tput.steady_rate:.0f} examples/s")
        self.logger.info("---------------Test Score---------------")
        self.load()
        scores, result_info = self.test(0)
        return scores, result_info
