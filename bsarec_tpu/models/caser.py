"""Caser (WSDM 2018) — convolutional sequence embedding.

Behavioral contract: `src/model/caser.py` — horizontal Conv2d banks
with kernel heights 1..L (nh channels each, relu + max-pool over time)
plus a vertical Conv2d (L×1, nv channels), concatenated with a user
embedding through two relu FC layers; pairwise BCE loss with L2
regularization on user/item/conv_v/fc weights and the conv_h bank.

TPU-first design: the L horizontal convolutions over a length-L input
are exactly sliding dot products against the [L, H] embedding map, so
each bank is realized as a dense [i*H → nh] contraction over unfolded
windows — batched matmuls on the MXU instead of L tiny conv dispatches.
Conv weights use torch's default kaiming-uniform fan-in bounds (the
reference's `init_weights` does not touch Conv2d).
"""

from __future__ import annotations

import flax.linen as nn

from bsarec_tpu.core.dropout import FastDropout
import jax
import jax.numpy as jnp
import numpy as np

from bsarec_tpu.models.base import SequentialRecModel, padded_normal_init
from bsarec_tpu.models.modules import normal_init
from bsarec_tpu.ops.losses import pair_bce_masked


def _centered_uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def kaiming_uniform_torch(fan_in: int):
    """torch Conv2d default: U(-b, b), b = sqrt(6 / ((1 + 5) * fan_in))."""
    return _centered_uniform(float(np.sqrt(6.0 / (6.0 * fan_in))))


def conv_bias_uniform(fan_in: int):
    return _centered_uniform(float(1.0 / np.sqrt(fan_in)))


class CaserModel(SequentialRecModel):
    def setup_model(self):
        cfg = self.config
        self.user_embeddings = nn.Embed(
            cfg.num_users,
            cfg.hidden_size,
            embedding_init=padded_normal_init(cfg.initializer_range),
            name="user_embeddings",
        )
        L, H = cfg.max_seq_length, cfg.hidden_size
        # horizontal bank: one [i*H, nh] kernel per height i (+ bias)
        self.conv_h_kernels = [
            self.param(f"conv_h_{i}_kernel", kaiming_uniform_torch(i * H), (i * H, cfg.nh))
            for i in range(1, L + 1)
        ]
        self.conv_h_biases = [
            self.param(f"conv_h_{i}_bias", conv_bias_uniform(i * H), (cfg.nh,))
            for i in range(1, L + 1)
        ]
        self.conv_v_kernel = self.param("conv_v_kernel", kaiming_uniform_torch(L), (L, cfg.nv))
        self.conv_v_bias = self.param("conv_v_bias", conv_bias_uniform(L), (cfg.nv,))

        init = normal_init(cfg.initializer_range)
        self.fc1 = nn.Dense(H, kernel_init=init, name="fc1")
        self.fc2 = nn.Dense(H, kernel_init=init, name="fc2")
        self.fc_dropout = FastDropout(cfg.hidden_dropout_prob)

    def forward(self, input_ids, user_ids=None, *, train: bool = False, all_layers: bool = False):
        cfg = self.config
        L, H = cfg.max_seq_length, cfg.hidden_size
        emb = self.embed_items(input_ids)  # [B, L, H]
        if user_ids is None:  # shape-init path only
            user_ids = jnp.zeros((input_ids.shape[0],), jnp.int32)
        user_emb = self.user_embeddings(user_ids.reshape(-1))  # [B, H]

        # vertical conv: [L] -> nv contraction per hidden channel
        out_v = jnp.einsum("blh,lv->bvh", emb, self.conv_v_kernel) + self.conv_v_bias[None, :, None]
        out_v = out_v.reshape(emb.shape[0], cfg.nv * H)

        # horizontal bank: window height i, relu, max-pool over time.
        # All L banks evaluate as ONE windowed gather + ONE einsum (a
        # [B·L, L·H] × [L·H, L·nh] matmul on the MXU) instead of L conv
        # dispatches: W[i, j] holds bank i's row j (zero for j >= i), so
        # out[b, i, t] = relu(Σ_j emb[b, t+j] · W[i, j] + bias[i]).
        t_idx = jnp.arange(L)[:, None] + jnp.arange(L)[None, :]  # [t, j] = t + j
        gathered = emb[:, jnp.minimum(t_idx, L - 1)]  # [B, L(t), L(j), H]
        bank = jnp.stack(
            [
                jnp.pad(
                    self.conv_h_kernels[i - 1].reshape(i, H, cfg.nh),
                    ((0, L - i), (0, 0), (0, 0)),
                )
                for i in range(1, L + 1)
            ]
        )  # [L(i), L(j), H, nh]
        biases = jnp.stack(self.conv_h_biases)  # [L, nh]
        conv = jax.nn.relu(
            jnp.einsum(
                "btjh,ijhn->bitn", gathered, bank, preferred_element_type=jnp.float32
            )
            + biases[None, :, None, :]
        )  # [B, L(i), L(t), nh]
        # bank i (height i+1) is valid at positions t <= L - (i+1)
        valid = (
            jnp.arange(L)[:, None] + jnp.arange(L)[None, :] <= L - 1
        )  # [i, t]: t + i <= L - 1  <=>  t <= L - height
        conv = jnp.where(valid[None, :, :, None], conv, -jnp.inf)
        out_h = jnp.max(conv, axis=2).reshape(emb.shape[0], L * cfg.nh)  # [B, L*nh]

        out = jnp.concatenate([out_v, out_h], axis=1)
        out = self.fc_dropout(out, deterministic=not train)
        z = jax.nn.relu(self.fc1(out))
        seq_output = jax.nn.relu(self.fc2(jnp.concatenate([z, user_emb], axis=1)))
        return seq_output[:, None, :]  # [B, 1, H]

    def calculate_loss(self, input_ids, answers, neg_answers, same_target, user_ids, *, train: bool = True):
        cfg = self.config
        seq_out = self.forward(input_ids, user_ids, train=train)[:, -1, :]
        pos_logits = jnp.sum(self.embed_items(answers) * seq_out, axis=-1)
        neg_logits = jnp.sum(self.embed_items(neg_answers) * seq_out, axis=-1)
        loss = pair_bce_masked(pos_logits, neg_logits, answers)

        def fro(w):
            return jnp.sqrt(jnp.sum(jnp.square(w)))

        reg = (
            fro(self.user_embeddings.embedding)
            + fro(self.item_table)
            + fro(self.conv_v_kernel)
            + fro(self.fc1.variables["params"]["kernel"])
            + fro(self.fc2.variables["params"]["kernel"])
        )
        reg_h = sum(fro(k) for k in self.conv_h_kernels)
        return loss + cfg.reg_weight * reg + cfg.reg_weight * reg_h

    def predict(self, input_ids, user_ids=None):
        return self.forward(input_ids, user_ids, train=False)
