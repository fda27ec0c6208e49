"""BSARec — attentive inductive bias beyond self-attention (AAAI 2024).

Behavioral contract from `src/model/bsarec.py`: each block blends a
frequency-domain filter branch (`dsp`) with standard multi-head
attention (`gsp`) as `alpha*dsp + (1-alpha)*gsp`, followed by the
shared FeedForward. The FrequencyLayer low-passes the sequence via
rFFT bin truncation and rescales the high-pass residue by a learnable
per-channel `sqrt_beta**2`.

TPU-first design: the rFFT→truncate→irFFT chain is a fixed linear
projection on the (tiny, static) sequence axis, so it is realized as a
single [L, L] matmul on the MXU (`ops.frequency.lowpass_projection_matrix`)
— bit-compatible math, no complex dtype, fully fusable by XLA, and its
transpose (=itself) is the exact VJP of the reference's kept-bins path.
"""

from __future__ import annotations

import flax.linen as nn

from bsarec_tpu.core.dropout import FastDropout
import jax.numpy as jnp

from bsarec_tpu.models.base import SequentialRecModel
from bsarec_tpu.models.modules import (
    EncoderConfig,
    FeedForward,
    MultiHeadAttention,
    TFLayerNorm,
    normal_init,
)
from bsarec_tpu.ops.frequency import frequency_filter, lowpass_projection_matrix
from bsarec_tpu.ops.losses import full_softmax_ce


class FrequencyLayer(nn.Module):
    config: EncoderConfig
    c: int

    @nn.compact
    def __call__(self, x, *, train: bool):
        cfg = self.config
        dt = cfg.compute_dtype
        sqrt_beta = self.param("sqrt_beta", normal_init(1.0), (1, 1, cfg.hidden_size))
        proj = jnp.asarray(lowpass_projection_matrix(x.shape[1], self.c))
        h = frequency_filter(x.astype(dt), proj.astype(dt), sqrt_beta)
        h = FastDropout(cfg.hidden_dropout_prob, deterministic=not train)(h)
        return TFLayerNorm(name="LayerNorm")(h + x)


class BSARecLayer(nn.Module):
    config: EncoderConfig
    c: int
    alpha: float

    @nn.compact
    def __call__(self, x, attention_mask, *, train: bool):
        dsp = FrequencyLayer(self.config, self.c, name="filter_layer")(x, train=train)
        gsp = MultiHeadAttention(self.config, name="attention_layer")(x, attention_mask, train=train)
        return self.alpha * dsp + (1.0 - self.alpha) * gsp


class BSARecBlock(nn.Module):
    config: EncoderConfig
    c: int
    alpha: float

    @nn.compact
    def __call__(self, x, attention_mask, *, train: bool):
        x = BSARecLayer(self.config, self.c, self.alpha, name="layer")(x, attention_mask, train=train)
        return FeedForward(self.config, name="feed_forward")(x, train=train)


class BSARecModel(SequentialRecModel):
    def setup_model(self):
        cfg = self.encoder_config
        self.blocks = [
            BSARecBlock(cfg, self.config.c, self.config.alpha, name=f"block_{i}")
            for i in range(cfg.num_hidden_layers)
        ]

    def forward(self, input_ids, user_ids=None, *, train: bool = False, all_layers: bool = False):
        mask = self.get_attention_mask(input_ids)
        x = self.add_position_embedding(input_ids, train=train)
        outputs = [x]
        for block in self.blocks:
            x = block(x, mask, train=train)
            outputs.append(x)
        return outputs if all_layers else x

    def calculate_loss(self, input_ids, answers, neg_answers, same_target, user_ids, *, train: bool = True):
        seq_output = self.forward(input_ids, train=train)
        return full_softmax_ce(seq_output[:, -1, :], self.item_table, answers, impl=self.config.loss_impl, dtype=self.config.compute_dtype)
