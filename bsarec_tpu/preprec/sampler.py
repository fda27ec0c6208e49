"""Device-resident batch sampler — the WarpSampler replacement.

The reference feeds training with daemon multiprocessing workers
pushing Python-built batches through a Queue
(`repo-b/utils.py:252-311`). Here the whole per-user dataset lives in
HBM (see `data.py`) and a training *epoch* is a single jitted scan:
users are drawn uniformly (with replacement, matching the reference's
random-user sampling), sequences/targets are gathers, and per-position
rejection negatives are drawn on device. Only CL4SRec's augmentations
are produced host-side (vectorized numpy) and uploaded once per epoch.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def draw_user_batches(rng: np.random.Generator, eligible: np.ndarray, steps: int, batch: int) -> np.ndarray:
    """[steps, batch] 1-based user ids, uniform with replacement."""
    return eligible[rng.integers(0, eligible.size, size=(steps, batch))]


def positional_negatives(key, exclusion_rows, pos, itemnum, rounds: int = 6):
    """Per-position negatives in [1, itemnum] excluding the user's train
    items (`repo-b/utils.py:11-15`): pos==0 positions get neg 0."""

    def collides(cand):
        return jnp.any(exclusion_rows[:, None, :] == cand[:, :, None], axis=-1)

    def body(i, carry):
        key, cand = carry
        key, sub = jax.random.split(key)
        fresh = jax.random.randint(sub, cand.shape, 1, itemnum + 1, dtype=jnp.int32)
        return key, jnp.where(collides(cand), fresh, cand)

    key, sub = jax.random.split(key)
    cand = jax.random.randint(sub, pos.shape, 1, itemnum + 1, dtype=jnp.int32)
    _, cand = jax.lax.fori_loop(0, rounds, body, (key, cand))
    return jnp.where(pos != 0, cand, 0)


def cloze_mask(key, tokens, itemnum, mask_prob):
    """BERT-style 80/10/10 masking with token 0 as [mask]
    (`repo-b/utils.py:100-189`): labels carry the original item at
    masked positions, 0 elsewhere; padding is never masked."""
    k1, k2, k3 = jax.random.split(key, 3)
    prob = jax.random.uniform(k1, tokens.shape)
    is_real = tokens > 0
    selected = (prob < mask_prob) & is_real
    sub = prob / jnp.maximum(mask_prob, 1e-9)
    rand_items = jax.random.randint(k3, tokens.shape, 1, itemnum + 1, dtype=jnp.int32)
    replacement = jnp.where(sub < 0.8, 0, jnp.where(sub < 0.9, rand_items, tokens))
    masked = jnp.where(selected, replacement, tokens)
    labels = jnp.where(selected, tokens, 0)
    return masked, labels


def newb4rec_candidates(key, masked, itemnum, compare):
    """[B, T, compare+1] sampled-softmax candidate ids: `compare`
    uniform draws in [1, itemnum] plus the reference-exact gold column —
    the MASKED INPUT token, not the label (`repo-b/model.py:382-390`:
    the comment there says "appending actual labels" but the code
    appends `seqs`, so at a supervised position the gold candidate is
    the mask token (80%), a random item (10%), or the true item (10%)
    per the cloze rule). The CE in `train.py:newb4rec_loss` targets this
    last column at labels != 0 (`repo-b/train_test.py:189-193`)."""
    rand_c = jax.random.randint(
        key, masked.shape + (compare,), 1, itemnum + 1, dtype=jnp.int32
    )
    return jnp.concatenate([rand_c, masked[..., None]], axis=-1)


def permute_user_items(key, rows):
    """Random order of each row's nonzero items, right-padded with 0
    (BPRMF sampler, `repo-b/utils.py:191-216`)."""
    keys = jax.random.uniform(key, rows.shape)
    keys = jnp.where(rows > 0, keys, jnp.inf)
    order = jnp.argsort(keys, axis=-1)
    return jnp.take_along_axis(rows, order, axis=-1)


# ---- CL4SRec augmentations (host, vectorized; repo-b/model.py:703-760) ----

def _crop_row(rng, row, length, maxlen, eta=0.6):
    num_left = int(math.floor(length * eta))
    if length - num_left <= 1:
        return row
    crop_begin = rng.integers(1, length - num_left + 1)
    out = np.zeros_like(row)
    out[maxlen - num_left :] = row[maxlen - num_left - crop_begin : maxlen - crop_begin]
    return out


def _mask_row(rng, row, length, maxlen, gamma=0.3):
    num_mask = int(math.floor(length * gamma))
    if num_mask == 0:
        return row
    idx = rng.integers(1, length + 1, size=num_mask)
    out = row.copy()
    out[maxlen - idx] = 0
    return out


def _reorder_row(rng, row, length, maxlen, beta=0.6):
    num_reorder = int(math.floor(length * beta))
    if length - num_reorder <= 1:
        return row
    begin = rng.integers(1, length - num_reorder)
    out = row.copy()
    idx = np.arange(maxlen - begin - num_reorder, maxlen - begin)
    rng.shuffle(idx)
    out[idx] = row[maxlen - begin - num_reorder : maxlen - begin]
    return out


def augment_batch(rng: np.random.Generator, seqs: np.ndarray, lens: np.ndarray):
    """Two independently augmented views per row (crop/mask/reorder,
    two distinct ops per row as in `model.py:762-780`)."""
    maxlen = seqs.shape[1]
    ops = [_crop_row, _mask_row, _reorder_row]
    aug1 = seqs.copy()
    aug2 = seqs.copy()
    for i in range(seqs.shape[0]):
        length = int(lens[i])
        if length <= 1:
            continue
        a, b = rng.choice(3, size=2, replace=False)
        aug1[i] = ops[a](rng, seqs[i], length, maxlen)
        aug2[i] = ops[b](rng, seqs[i], length, maxlen)
    return aug1, aug2
