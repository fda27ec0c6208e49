"""Jitted training / eval loops.

TPU-first redesign of the reference's per-batch Python loop
(`src/trainers.py:85-158`): the *entire epoch* is one `lax.scan` under
`jit` — batch gathering from the HBM-resident dataset, on-device
rejection negative sampling (semantics of `src/dataset.py:120-124`),
forward/backward, and Adam updates all fuse into a single XLA program
with zero steady-state host↔device traffic. Eval likewise scans over
user batches with on-device full-catalog scoring, seen-item masking
and top-k (replacing the reference's D2H copy + numpy argpartition,
`src/trainers.py:126-149`).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import optax

from bsarec_tpu.ops.topk import masked_topk, topk_metrics

try:
    from jax.sharding import NamedSharding, PartitionSpec as P
except ImportError:  # pragma: no cover
    NamedSharding = P = None


def _data_constraint(tree, mesh):
    """Force [B, ...] arrays onto the data axis (replicated otherwise)."""
    if mesh is None:
        return tree

    def constrain(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return jax.tree.map(constrain, tree)


def make_optimizer(train_cfg) -> optax.GradientTransformation:
    """torch.optim.Adam semantics (`src/trainers.py:27-28`): L2-in-grad
    weight decay (not decoupled), eps=1e-8, bias-corrected moments."""
    chain = []
    if train_cfg.weight_decay:
        chain.append(optax.add_decayed_weights(train_cfg.weight_decay))
    chain.append(
        optax.scale_by_adam(b1=train_cfg.adam_beta1, b2=train_cfg.adam_beta2, eps=1e-8)
    )
    chain.append(optax.scale(-train_cfg.lr))
    return optax.chain(*chain)


def sample_negatives(key, input_ids, answers, item_size, rounds: int = 8):
    """Uniform negatives in [1, item_size) rejecting the sample's items.

    The sample's item set is exactly {nonzero input ids} ∪ {answer}
    (prefix + answer, `src/dataset.py:66-70`). Bounded resampling: the
    collision probability after 8 rounds is ~(L/V)^8 ≈ 0 for all
    reference datasets.
    """
    batch = answers.shape[0]

    def collides(cand):
        in_prefix = jnp.any(input_ids == cand[:, None], axis=1)
        return in_prefix | (cand == answers)

    def body(i, carry):
        key, cand = carry
        key, sub = jax.random.split(key)
        fresh = jax.random.randint(sub, (batch,), 1, item_size, dtype=jnp.int32)
        cand = jnp.where(collides(cand), fresh, cand)
        return key, cand

    key, sub = jax.random.split(key)
    cand = jax.random.randint(sub, (batch,), 1, item_size, dtype=jnp.int32)
    _, cand = jax.lax.fori_loop(0, rounds, body, (key, cand))
    return cand


# ~1 GiB of concurrently-live residuals: unrolled scan bodies keep all
# their activation residuals alive at once, and this host's TPU workers
# fault ungracefully when HBM-resident state nears the limit (CLAUDE.md)
_UNROLL_RESID_BUDGET_BYTES = 1 << 30


def resolve_scan_unroll(requested: int, model_cfg, batch_size: int,
                        dense_loss: bool = True):
    """Effective epoch-scan unroll factor.

    requested > 0 is honored verbatim (the explicit `--scan_unroll`
    escape hatch; 1 minimizes peak residual memory). requested == 0
    ("auto") starts from the measured-fastest 8 (v5e parity config:
    2 -> 245k, 4 -> 254k, 8 -> 260k ex/s) and halves while the estimated
    unrolled residual footprint exceeds ~1 GiB, so long-sequence /
    many-layer / huge-catalog configs downshift instead of faulting the
    TPU worker. The estimate is a coarse f32 activation count: ~8
    [B, L, H] tensors per encoder layer, attention probs
    [B, heads, L, L] (fwd + dropout mask), and — when the full-vocab CE
    is dense — the [B, V] logits fwd+bwd.

    Returns (unroll, estimated_bytes_per_body).
    """
    B, L, H = batch_size, model_cfg.max_seq_length, model_cfg.hidden_size
    layers = model_cfg.num_hidden_layers
    per_body = B * L * H * 8 * layers
    per_body += B * model_cfg.num_attention_heads * L * L * 2 * layers
    if dense_loss:
        per_body += 2 * B * model_cfg.item_size
    else:
        # streaming CE: each unrolled body materializes a full [V, H]
        # item-table gradient — at 1M x 64 that is 256 MiB/body, and
        # XLA does not reliably chain their liveness across unrolled
        # bodies (round-4 million_item_e2e RESOURCE_EXHAUSTED)
        per_body += model_cfg.item_size * H
    est = per_body * 4
    if requested > 0:
        return requested, est
    unroll = 8
    while unroll > 1 and est * unroll > _UNROLL_RESID_BUDGET_BYTES:
        unroll //= 2
    return unroll, est


def _with_dropout_pool(apply):
    """Wrap a `(params, batch, dropout_key) -> loss` apply so that under
    BSAREC_DROPOUT=pooled (+ rbg PRNG) every dropout site's bits come
    from ONE RngBitGenerator call: a jax.eval_shape pass over the same
    apply counts the word demand through `core.dropout.dropout_bit_pool`,
    then the real trace runs with the pooled words in scope, each site
    taking a static slice. With pooling disabled this is the identity."""
    from bsarec_tpu.core import dropout as fdrop

    def wrapped(params, batch, dropout_key):
        if not fdrop.pool_enabled():
            return apply(params, batch, dropout_key)
        with fdrop.dropout_bit_pool(None) as counter:
            jax.eval_shape(apply, params, batch, dropout_key)
        words = jax.random.bits(dropout_key, (counter.offset,), jnp.uint32)
        with fdrop.dropout_bit_pool(words):
            return apply(params, batch, dropout_key)

    return wrapped


def build_train_epoch(model, tx, item_size: int, batch_size: int, num_samples: int, with_sem: bool, mesh=None, unroll: int = 2, remat: bool = False):
    """Returns a jitted `epoch(params, opt_state, key, inputs, answers,
    users, sem) -> (params, opt_state, mean_loss)`.

    With a mesh, each step's batch is constrained onto the `data` axis;
    parameter placement (replicated dense tower, vocab-sharded item
    table) is decided by the caller and XLA's SPMD partitioner inserts
    the psum/all-gather collectives."""
    steps = math.ceil(num_samples / batch_size)
    padded = steps * batch_size

    def loss_fn(params, batch, dropout_key):
        return model.apply(
            {"params": params},
            batch["input_ids"],
            batch["answers"],
            batch["neg_answers"],
            batch["same_target"],
            batch["user_ids"],
            train=True,
            method="calculate_loss",
            rngs={"dropout": dropout_key},
        )

    loss_fn = _with_dropout_pool(loss_fn)
    if remat:
        # whole-loss rematerialization: the backward re-runs the forward
        # instead of keeping per-layer residuals alive — the coarse but
        # model-agnostic form of jax.checkpoint (long-context lever)
        loss_fn = jax.checkpoint(loss_fn)
    grad_fn = jax.value_and_grad(loss_fn)

    def epoch(params, opt_state, key, inputs, answers, users, sem):
        perm_key, key = jax.random.split(key)
        perm = jax.random.permutation(perm_key, num_samples)
        if padded != num_samples:
            perm = jnp.concatenate([perm, perm[: padded - num_samples]])
        perm = perm.reshape(steps, batch_size)

        def body(carry, xs):
            params, opt_state, loss_sum = carry
            idx, step = xs
            step_key = jax.random.fold_in(key, step)
            neg_key, drop_key = jax.random.split(step_key)
            batch = {
                "input_ids": inputs[idx],
                "answers": answers[idx],
                "user_ids": users[idx],
                "same_target": sem[idx] if with_sem else jnp.zeros((batch_size, 0), jnp.int32),
            }
            batch["neg_answers"] = sample_negatives(
                neg_key, batch["input_ids"], batch["answers"], item_size
            )
            batch = _data_constraint(batch, mesh)
            loss, grads = grad_fn(params, batch, drop_key)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, loss_sum + loss), None

        (params, opt_state, loss_sum), _ = jax.lax.scan(
            body, (params, opt_state, 0.0), (perm, jnp.arange(steps)),
            # unroll=2 halves scan-loop overhead (semantics unchanged);
            # unroll=1 halves peak activation memory for big models
            unroll=unroll,
        )
        return params, opt_state, loss_sum / steps

    return jax.jit(epoch, donate_argnums=(0, 1)), steps


def build_train_step(model, tx, item_size: int, with_sem: bool, mesh=None, remat: bool = False):
    """Single jitted optimizer step for host-fed batches (`--multihost`,
    `data/multihost.py:HostShardedDataset`).

    Mirrors `build_train_epoch`'s scan body exactly — same key split
    (step_key -> neg/dropout), same negative sampling, same update — so
    that at process_count=1 the host-fed epoch reproduces the
    HBM-resident scan's loss trajectory (pinned by
    tests/test_multihost.py). `batch` needs input_ids/answers/user_ids
    (+ same_target when with_sem)."""

    def loss_fn(params, batch, dropout_key):
        return model.apply(
            {"params": params},
            batch["input_ids"],
            batch["answers"],
            batch["neg_answers"],
            batch["same_target"],
            batch["user_ids"],
            train=True,
            method="calculate_loss",
            rngs={"dropout": dropout_key},
        )

    loss_fn = _with_dropout_pool(loss_fn)
    if remat:
        loss_fn = jax.checkpoint(loss_fn)
    grad_fn = jax.value_and_grad(loss_fn)

    def step(params, opt_state, step_key, batch):
        neg_key, drop_key = jax.random.split(step_key)
        batch = dict(batch)
        if not with_sem:
            batch["same_target"] = jnp.zeros(
                (batch["input_ids"].shape[0], 0), jnp.int32
            )
        batch["neg_answers"] = sample_negatives(
            neg_key, batch["input_ids"], batch["answers"], item_size
        )
        batch = _data_constraint(batch, mesh)
        loss, grads = grad_fn(params, batch, drop_key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


# Above this catalog size (and on TPU) eval switches from the dense
# [B, V] score materialization to the streaming Pallas rank kernel.
STREAMING_RANK_MIN_VOCAB = 262_144


def build_eval_fn(model, item_size: int, batch_size: int, num_users: int, impl: str = "auto", mesh=None, dtype: str = "float32", collect_topk: bool = False, seen_format: str = "bitmask"):
    """Returns a jitted `evaluate(params, inputs, answers, seen) ->
    metric sums` (see `ops.topk.topk_metrics` layout).

    impl: "dense" scores the full catalog per batch and masks/top-ks it
    ([B, V] lives briefly in HBM); "streaming" runs the Pallas vocab
    sweep (`ops/pallas_rank.py`, `seen` is then a packed bitmask);
    "sharded_streaming" runs the per-shard Pallas sweep composition
    over a vocab-sharded mesh (`parallel/logits.py`, `seen` is then a
    [m, B, W] bitmask stack from `build_seen_bitmask_sharded`);
    "auto" picks streaming on TPU for production-scale catalogs.
    `dtype` is the scoring-matmul compute dtype (the bf16 policy).

    seen_format (streaming impl only): "bitmask" passes the prebuilt
    [U, Vp/32] bitmask straight to the sweep; "ids" passes the 0-padded
    UNIQUE-per-row [U, S] seen-id lists and builds each batch's
    [B, Vp/32] bitmask on device (`ops.pallas_rank.seen_ids_to_bitmask`)
    — the Trainer switches to "ids" when staging both splits' bitmasks
    would exceed `SEEN_BITMASK_STAGE_LIMIT` (huge catalogs: 1M items x
    50k users is 2 x 6.25 GB staged, a chip OOM). The dense path always
    takes id lists; sharded_streaming keeps host-prebuilt shard stacks.

    collect_topk: the export variant — the jitted fn instead returns
    the [num_users, 20] top-k ITEM IDS per user (catalog row i is item
    id i), seen-items masked, the same ranking the metrics are computed
    from (`--export_topk`; reference-parity 0.0-zeroing of seen items —
    the `--export_serving` artifact instead masks them to -inf, see
    `serving.py:serving_masked_topk`)."""
    steps = math.ceil(num_users / batch_size)
    padded = steps * batch_size
    if impl == "auto":
        impl = (
            "streaming"
            if item_size >= STREAMING_RANK_MIN_VOCAB and jax.default_backend() == "tpu"
            else "dense"
        )

    def evaluate(params, inputs, answers, seen):
        idx_all = jnp.arange(padded).reshape(steps, batch_size)

        def predict_and_table(mdl, ids, uids):
            return mdl.predict(ids, uids), mdl.item_table

        def body(sums, idx):
            valid = (idx < num_users).astype(jnp.float32)
            safe = jnp.minimum(idx, num_users - 1)
            batch_inputs = _data_constraint(inputs[safe], mesh)
            out, table = model.apply(
                {"params": params}, batch_inputs, safe, method=predict_and_table
            )
            state = out[:, -1, :]
            if impl == "streaming":
                from bsarec_tpu.ops.pallas_rank import (
                    seen_ids_to_bitmask,
                    streaming_masked_topk,
                )

                seen_batch = seen[safe]
                if seen_format == "ids":
                    seen_batch = seen_ids_to_bitmask(seen_batch, item_size)
                _, topk_idx = streaming_masked_topk(
                    state, table, seen_batch, k=20, n_valid=item_size
                )
            elif impl == "sharded_streaming":
                from bsarec_tpu.parallel.logits import sharded_streaming_topk

                _, topk_idx = sharded_streaming_topk(
                    state, table, seen[:, safe], mesh,
                    k=20, max_valid_items=item_size,
                )
            else:
                dt = jnp.dtype(dtype)
                logits = jnp.einsum(
                    "bh,vh->bv",
                    state.astype(dt),
                    table[:item_size].astype(dt),
                    preferred_element_type=jnp.float32,
                )
                _, topk_idx = masked_topk(logits, seen[safe])
            if collect_topk:
                return sums, topk_idx
            return sums + topk_metrics(topk_idx, answers[safe], valid), None

        init = jnp.zeros((9,), jnp.float32)
        sums, per_batch = jax.lax.scan(body, init, idx_all)
        if collect_topk:
            return per_batch.reshape(padded, -1)[:num_users]
        return sums

    return jax.jit(evaluate), steps, impl
