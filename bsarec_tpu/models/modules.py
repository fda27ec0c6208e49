"""Shared transformer building blocks (Flax).

Numerics contract (reference: `src/model/_modules.py`):
- LayerNorm is TF-style: biased variance, eps=1e-12 inside the sqrt.
- FeedForward: dense(4H) → act → dense(H) → dropout → LN(x + res).
- MultiHeadAttention: post-LN, additive mask, softmax dropout,
  output dense + dropout + LN(x + res), scores scaled by √head_dim.
- GELU is the erf formulation.
- All dense/embedding weights init N(0, initializer_range); biases 0.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import flax.linen as nn

from bsarec_tpu.core.dropout import FastDropout
import jax
import jax.numpy as jnp


def normal_init(stddev: float):
    return nn.initializers.normal(stddev=stddev)


def erf_gelu(x):
    return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


ACT2FN: dict[str, Callable] = {
    "gelu": erf_gelu,
    "relu": jax.nn.relu,
    "swish": lambda x: x * jax.nn.sigmoid(x),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


class TFLayerNorm(nn.Module):
    """LayerNorm with epsilon inside the sqrt (TF style), eps=1e-12.

    Always computes (and returns) float32 regardless of the compute
    dtype policy — normalization statistics are precision-critical."""

    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        x = x.astype(jnp.float32)
        u = jnp.mean(x, axis=-1, keepdims=True)
        s = jnp.mean(jnp.square(x - u), axis=-1, keepdims=True)
        x = (x - u) * jax.lax.rsqrt(s + self.eps)
        return weight * x + bias


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Static architecture hyperparameters shared by the encoder stack."""

    hidden_size: int = 64
    num_hidden_layers: int = 2
    num_attention_heads: int = 2
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.5
    attention_probs_dropout_prob: float = 0.5
    initializer_range: float = 0.02
    max_seq_length: int = 50
    # compute dtype for the dense/attention matmuls; params, LayerNorm,
    # softmax and residual adds stay float32 (mixed-precision policy)
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class FeedForward(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x, *, train: bool):
        cfg = self.config
        dt = cfg.compute_dtype
        init = normal_init(cfg.initializer_range)
        h = nn.Dense(4 * cfg.hidden_size, kernel_init=init, dtype=dt, name="dense_1")(x)
        h = ACT2FN[cfg.hidden_act](h)
        h = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dt, name="dense_2")(h)
        h = FastDropout(cfg.hidden_dropout_prob, deterministic=not train)(h)
        return TFLayerNorm(name="LayerNorm")(h + x)


class MultiHeadAttention(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x, attention_mask, *, train: bool):
        cfg = self.config
        dt = cfg.compute_dtype
        init = normal_init(cfg.initializer_range)
        heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // heads
        batch, seq_len, _ = x.shape

        def proj(name):
            y = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dt, name=name)(x)
            return y.reshape(batch, seq_len, heads, head_dim)

        q = proj("query").transpose(0, 2, 1, 3)  # [B, h, L, d]
        k = proj("key").transpose(0, 2, 1, 3)
        v = proj("value").transpose(0, 2, 1, 3)

        # scores/softmax accumulate in fp32 even under the bf16 policy
        scores = jnp.einsum("bhld,bhmd->bhlm", q, k, preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(head_dim)).astype(scores.dtype)
        scores = scores + attention_mask
        probs = jax.nn.softmax(scores, axis=-1)
        # post-softmax attention maps for fig-2 spectral analysis
        # (`src/visualize/figure2.ipynb`): no-op unless apply() requests
        # mutable=["intermediates"]
        self.sow("intermediates", "attention_probs", probs)
        probs = FastDropout(cfg.attention_probs_dropout_prob, deterministic=not train)(probs)
        ctx = jnp.einsum(
            "bhlm,bhmd->bhld", probs.astype(dt), v, preferred_element_type=jnp.float32
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(batch, seq_len, cfg.hidden_size)

        out = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dt, name="dense")(ctx)
        out = FastDropout(cfg.hidden_dropout_prob, deterministic=not train)(out)
        return TFLayerNorm(name="LayerNorm")(out + x)


class TransformerBlock(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x, attention_mask, *, train: bool):
        x = MultiHeadAttention(self.config, name="attention")(x, attention_mask, train=train)
        return FeedForward(self.config, name="feed_forward")(x, train=train)


class TransformerEncoder(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x, attention_mask, *, train: bool, all_layers: bool = False):
        outputs = [x]
        for i in range(self.config.num_hidden_layers):
            x = TransformerBlock(self.config, name=f"block_{i}")(x, attention_mask, train=train)
            outputs.append(x)
        return outputs if all_layers else x
