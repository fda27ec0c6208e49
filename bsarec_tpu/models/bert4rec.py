"""BERT4Rec (CIKM 2019) — bidirectional encoder with cloze masking.

Behavioral contract: `src/model/bert4rec.py` — the item table gains a
[mask] row (id = item_size); training randomly replaces
`int(L * mask_ratio)` positions (uniform, without replacement) with
the mask token and applies full-vocab CE **on the last position vs the
answer** (the reference computes a cloze loss too but overwrites it at
`bert4rec.py:118-121`; that dead computation is elided here — same
gradients). Eval appends the mask token and drops the first position
(`reconstruct_test_data`, `bert4rec.py:132-140`), and the [mask]
logits column is trimmed before ranking (`src/trainers.py:133-137`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bsarec_tpu.models.base import SequentialRecModel
from bsarec_tpu.models.modules import TransformerEncoder
from bsarec_tpu.ops.losses import full_softmax_ce


class BERT4RecModel(SequentialRecModel):
    def vocab_rows(self) -> int:
        return self.config.item_size + 1  # + [mask]

    @property
    def mask_token(self) -> int:
        return self.config.item_size

    def setup_model(self):
        self.item_encoder = TransformerEncoder(self.encoder_config, name="item_encoder")

    def forward(self, input_ids, user_ids=None, *, train: bool = False, all_layers: bool = False):
        mask = self.get_bi_attention_mask(input_ids)
        x = self.add_position_embedding(input_ids, train=train)
        return self.item_encoder(x, mask, train=train, all_layers=all_layers)

    def calculate_loss(self, input_ids, answers, neg_answers, same_target, user_ids, *, train: bool = True):
        cfg = self.config
        mask_num = int(cfg.max_seq_length * cfg.mask_ratio)
        rng = self.make_rng("dropout")

        def pick(key):
            return jax.random.permutation(key, cfg.max_seq_length)[:mask_num]

        keys = jax.random.split(rng, input_ids.shape[0])
        masked_index = jax.vmap(pick)(keys)  # [B, mask_num]
        rows = jnp.arange(input_ids.shape[0])[:, None]
        masked_ids = input_ids.at[rows, masked_index].set(self.mask_token)

        seq_output = self.forward(masked_ids, train=train)
        return full_softmax_ce(seq_output[:, -1, :], self.item_table, answers, impl=self.config.loss_impl, dtype=self.config.compute_dtype)

    def predict(self, input_ids, user_ids=None):
        pad = jnp.full((input_ids.shape[0], 1), self.mask_token, dtype=input_ids.dtype)
        shifted = jnp.concatenate([input_ids, pad], axis=-1)[:, 1:]
        return self.forward(shifted, train=False)
