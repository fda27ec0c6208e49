"""GRU4Rec (DLRS 2016) — multi-layer GRU + dense projection, BPR loss.

Behavioral contract: `src/model/gru4rec.py` — bias-free batch-first
GRU stack (`num_hidden_layers` deep, width `gru_hidden_size`) over
dropped-out item embeddings, then a dense back-projection to the
embedding size. Loss: −log σ(pos − neg) at the last position.

TPU-first design: the recurrence runs as one `lax.scan` over the (50-
step) time axis with all three gates packed into a single [in, 3H]
matmul per step; weights are xavier-uniform like torch's l0 init.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from bsarec_tpu.models.base import SequentialRecModel
from bsarec_tpu.models.modules import normal_init
from bsarec_tpu.ops.losses import bpr_loss


class GRULayer(nn.Module):
    """Single bias-free GRU layer, torch gate conventions."""

    hidden_size: int

    @nn.compact
    def __call__(self, x):  # x: [B, L, in]
        in_dim = x.shape[-1]
        h_dim = self.hidden_size
        xavier = nn.initializers.xavier_uniform()
        w_ih = self.param("w_ih", xavier, (in_dim, 3 * h_dim))
        w_hh = self.param("w_hh", xavier, (h_dim, 3 * h_dim))

        gates_x = jnp.einsum("blc,cg->blg", x, w_ih, preferred_element_type=jnp.float32)

        def step(h, gx):
            gh = h @ w_hh
            xr, xz, xn = jnp.split(gx, 3, axis=-1)
            hr, hz, hn = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h = (1.0 - z) * n + z * h
            return h, h

        h0 = jnp.zeros((x.shape[0], h_dim), dtype=x.dtype)
        _, hs = jax.lax.scan(step, h0, gates_x.transpose(1, 0, 2))
        return hs.transpose(1, 0, 2)  # [B, L, H]


class GRU4RecModel(SequentialRecModel):
    def setup_model(self):
        cfg = self.config
        self.gru_layers = [
            GRULayer(cfg.gru_hidden_size, name=f"gru_{i}")
            for i in range(cfg.num_hidden_layers)
        ]
        self.dense = nn.Dense(
            cfg.hidden_size, kernel_init=normal_init(cfg.initializer_range), name="dense"
        )

    def forward(self, input_ids, user_ids=None, *, train: bool = False, all_layers: bool = False):
        x = self.embed_items(input_ids)
        x = self.emb_dropout(x, deterministic=not train)
        for gru in self.gru_layers:
            x = gru(x)
        return self.dense(x)

    def calculate_loss(self, input_ids, answers, neg_answers, same_target, user_ids, *, train: bool = True):
        seq_out = self.forward(input_ids, train=train)[:, -1, :]
        pos_logits = jnp.sum(self.embed_items(answers) * seq_out, axis=-1)
        neg_logits = jnp.sum(self.embed_items(neg_answers) * seq_out, axis=-1)
        return bpr_loss(pos_logits, neg_logits)
