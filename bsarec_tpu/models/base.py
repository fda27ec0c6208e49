"""Abstract sequential-recommendation model (Flax).

API parity with the reference's `SequentialRecModel`
(`src/model/_abstract_model.py:71-78`): `forward`, `calculate_loss`,
`predict`, plus the shared item+position embedding entry
(`add_position_embedding`, `_abstract_model.py:14-24`) and mask
builders. Models are pure pytrees of params; dropout randomness comes
from the 'dropout' rng collection so a single `apply` of
`calculate_loss` can take several independently-dropped forward passes
(needed by DuoRec/FEARec).

Padding-row semantics: torch's `padding_idx=0` zero-inits row 0 and
blocks gradient flow from *lookup* paths only — the tied full-vocab
logits matmul still updates row 0. `embed_items` reproduces exactly
that split via a stop-gradient on padded positions.
"""

from __future__ import annotations

import flax.linen as nn

from bsarec_tpu.core.dropout import FastDropout
import jax
import jax.numpy as jnp

from bsarec_tpu.config import ModelConfig
from bsarec_tpu.models.modules import EncoderConfig, TFLayerNorm, normal_init
from bsarec_tpu.ops.masks import bidirectional_additive_mask, causal_additive_mask


def padded_normal_init(stddev: float):
    """N(0, stddev) init with row 0 (padding id) zeroed."""

    def init(key, shape, dtype=jnp.float32):
        table = jax.random.normal(key, shape, dtype) * stddev
        return table.at[0].set(0.0)

    return init


class SequentialRecModel(nn.Module):
    config: ModelConfig

    @property
    def encoder_config(self) -> EncoderConfig:
        cfg = self.config
        return EncoderConfig(
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            hidden_act=cfg.hidden_act,
            hidden_dropout_prob=cfg.hidden_dropout_prob,
            attention_probs_dropout_prob=cfg.attention_probs_dropout_prob,
            initializer_range=cfg.initializer_range,
            max_seq_length=cfg.max_seq_length,
            dtype=cfg.compute_dtype,
        )

    def vocab_rows(self) -> int:
        """Item-table row count (BERT4Rec adds a [mask] row)."""
        return self.config.item_size

    def setup(self):
        cfg = self.config
        self.item_embeddings = nn.Embed(
            self.vocab_rows(),
            cfg.hidden_size,
            embedding_init=padded_normal_init(cfg.initializer_range),
            name="item_embeddings",
        )
        self.position_embeddings = nn.Embed(
            cfg.max_seq_length,
            cfg.hidden_size,
            embedding_init=normal_init(cfg.initializer_range),
            name="position_embeddings",
        )
        self.emb_layer_norm = TFLayerNorm(name="emb_layer_norm")
        self.emb_dropout = FastDropout(cfg.hidden_dropout_prob)
        self.setup_model()

    def setup_model(self):
        raise NotImplementedError

    # ---- shared pieces -------------------------------------------------
    @property
    def item_table(self) -> jnp.ndarray:
        return self.item_embeddings.embedding

    def embed_items(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.item_table
        vals = jnp.take(table, ids, axis=0)
        frozen = jnp.take(jax.lax.stop_gradient(table), ids, axis=0)
        return jnp.where((ids > 0)[..., None], vals, frozen)

    def add_position_embedding(self, input_ids: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        seq_len = input_ids.shape[-1]
        pos = self.position_embeddings(jnp.arange(seq_len))
        emb = self.embed_items(input_ids) + pos[None, :, :]
        emb = self.emb_layer_norm(emb)
        return self.emb_dropout(emb, deterministic=not train)

    @staticmethod
    def get_attention_mask(input_ids):
        return causal_additive_mask(input_ids)

    @staticmethod
    def get_bi_attention_mask(input_ids):
        return bidirectional_additive_mask(input_ids)

    # ---- API ------------------------------------------------------------
    def __call__(self, input_ids, user_ids=None, *, train: bool = False, all_layers: bool = False):
        return self.forward(input_ids, user_ids, train=train, all_layers=all_layers)

    def forward(self, input_ids, user_ids=None, *, train: bool = False, all_layers: bool = False):
        raise NotImplementedError

    def predict(self, input_ids, user_ids=None):
        """Eval-time forward; returns [B, L', H] (trainer takes [:, -1])."""
        return self.forward(input_ids, user_ids, train=False)

    def calculate_loss(self, input_ids, answers, neg_answers, same_target, user_ids, *, train: bool = True):
        raise NotImplementedError

    def eval_logits_slice(self) -> int:
        """Number of leading logits columns valid at eval (BERT4Rec trims
        its [mask] column, `src/trainers.py:133-137`)."""
        return self.config.item_size
