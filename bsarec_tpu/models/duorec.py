"""DuoRec (WSDM 2022) — contrastive regularization for representation
degeneration.

Behavioral contract: `src/model/duorec.py` — a causal transformer with
full-vocab CE plus InfoNCE terms between (a) a second dropout-resampled
forward of the same sequence and (b) a forward of a "semantically
augmented" sequence sharing the same target item (`same_target` batch
column, produced by the data pipeline's same-target index). All
contrastive forwards run in train mode so dropout provides the views;
Flax's per-call rng folding gives each forward an independent mask.
"""

from __future__ import annotations

from bsarec_tpu.models.base import SequentialRecModel
from bsarec_tpu.models.modules import TransformerEncoder
from bsarec_tpu.ops.losses import full_softmax_ce, info_nce_logits


class DuoRecModel(SequentialRecModel):
    def setup_model(self):
        self.item_encoder = TransformerEncoder(self.encoder_config, name="item_encoder")

    def forward(self, input_ids, user_ids=None, *, train: bool = False, all_layers: bool = False):
        mask = self.get_attention_mask(input_ids)
        x = self.add_position_embedding(input_ids, train=train)
        return self.item_encoder(x, mask, train=train, all_layers=all_layers)

    def calculate_loss(self, input_ids, answers, neg_answers, same_target, user_ids, *, train: bool = True):
        cfg = self.config
        seq_output = self.forward(input_ids, train=train)
        loss = full_softmax_ce(seq_output[:, -1, :], self.item_table, answers, impl=self.config.loss_impl, dtype=self.config.compute_dtype)

        if cfg.ssl in ("us", "un"):
            aug = self.forward(input_ids, train=train)
            loss += cfg.lmd * info_nce_logits(
                seq_output[:, -1, :], aug[:, -1, :], cfg.tau, cfg.sim
            )
        if cfg.ssl in ("us", "su"):
            sem = self.forward(same_target, train=train)
            loss += cfg.lmd_sem * info_nce_logits(
                seq_output[:, -1, :], sem[:, -1, :], cfg.tau, cfg.sim
            )
        if cfg.ssl == "us_x":
            aug = self.forward(input_ids, train=train)
            sem = self.forward(same_target, train=train)
            loss += cfg.lmd_sem * info_nce_logits(
                aug[:, -1, :], sem[:, -1, :], cfg.tau, cfg.sim
            )
        return loss
