"""FMLP-Rec (WWW 2022) — all-MLP with learnable spectral filters.

Behavioral contract: `src/model/fmlprec.py` — no attention; each layer
multiplies the sequence spectrum by a learnable complex weight
[1, L//2+1, H] (ortho norms), residual-adds, LayerNorms, then the
shared FeedForward. Loss is the unmasked log-sigmoid BCE on pos/neg
dot products at the last position. The complex weight is stored as
separate real/imag planes (real-valued pytree leaves; torch stores the
same data as a trailing size-2 axis).
"""

from __future__ import annotations

import flax.linen as nn

from bsarec_tpu.core.dropout import FastDropout
import jax.numpy as jnp

from bsarec_tpu.models.base import SequentialRecModel
from bsarec_tpu.models.modules import EncoderConfig, FeedForward, TFLayerNorm, normal_init
from bsarec_tpu.ops.frequency import complex_filter_apply
from bsarec_tpu.ops.losses import pair_logsigmoid_bce


class FMLPRecLayer(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x, *, train: bool):
        cfg = self.config
        freq = cfg.max_seq_length // 2 + 1
        # torch init: randn(...) * 0.02 on both planes
        w_real = self.param("filter_real", normal_init(0.02), (1, freq, cfg.hidden_size))
        w_imag = self.param("filter_imag", normal_init(0.02), (1, freq, cfg.hidden_size))
        h = complex_filter_apply(x, w_real, w_imag)
        h = FastDropout(cfg.hidden_dropout_prob, deterministic=not train)(h)
        return TFLayerNorm(name="LayerNorm")(h + x)


class FMLPRecBlock(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = FMLPRecLayer(self.config, name="layer")(x, train=train)
        return FeedForward(self.config, name="feed_forward")(x, train=train)


class FMLPRecModel(SequentialRecModel):
    def setup_model(self):
        cfg = self.encoder_config
        self.blocks = [FMLPRecBlock(cfg, name=f"block_{i}") for i in range(cfg.num_hidden_layers)]

    def forward(self, input_ids, user_ids=None, *, train: bool = False, all_layers: bool = False):
        x = self.add_position_embedding(input_ids, train=train)
        outputs = [x]
        for block in self.blocks:
            x = block(x, train=train)
            outputs.append(x)
        return outputs if all_layers else x

    def calculate_loss(self, input_ids, answers, neg_answers, same_target, user_ids, *, train: bool = True):
        seq_out = self.forward(input_ids, train=train)[:, -1, :]
        pos_logits = jnp.sum(self.embed_items(answers) * seq_out, axis=-1)
        neg_logits = jnp.sum(self.embed_items(neg_answers) * seq_out, axis=-1)
        return pair_logsigmoid_bce(pos_logits, neg_logits)
