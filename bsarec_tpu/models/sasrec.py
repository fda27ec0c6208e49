"""SASRec (ICDM 2018) — causal transformer, pairwise BCE at the last step.

Behavioral contract: `src/model/sasrec.py` — causal TransformerEncoder
over embedded sequences; loss is BCE-with-logits on (answer, sampled
negative) dot products against the last-position state, restricted to
rows with a nonzero positive id.
"""

from __future__ import annotations

import jax.numpy as jnp

from bsarec_tpu.models.base import SequentialRecModel
from bsarec_tpu.models.modules import TransformerEncoder
from bsarec_tpu.ops.losses import pair_bce_masked


class SASRecModel(SequentialRecModel):
    def setup_model(self):
        self.item_encoder = TransformerEncoder(self.encoder_config, name="item_encoder")

    def forward(self, input_ids, user_ids=None, *, train: bool = False, all_layers: bool = False):
        mask = self.get_attention_mask(input_ids)
        x = self.add_position_embedding(input_ids, train=train)
        return self.item_encoder(x, mask, train=train, all_layers=all_layers)

    def calculate_loss(self, input_ids, answers, neg_answers, same_target, user_ids, *, train: bool = True):
        seq_out = self.forward(input_ids, train=train)[:, -1, :]
        pos_emb = self.embed_items(answers)
        neg_emb = self.embed_items(neg_answers)
        pos_logits = jnp.sum(pos_emb * seq_out, axis=-1)
        neg_logits = jnp.sum(neg_emb * seq_out, axis=-1)
        return pair_bce_masked(pos_logits, neg_logits, answers)
