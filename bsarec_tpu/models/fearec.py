"""FEARec (SIGIR 2023) — frequency-enhanced hybrid attention.

Behavioral contract from `src/model/fearec.py`: each layer computes

1. *Autocorrelation branch*: per-head Q/K spectra restricted to a
   layer-specific frequency band [left, right) (`fearec.py:229-249`),
   cross-power `q·conj(k)` scattered back and inverse-transformed to a
   lag-correlation `corr`; top-k time delays (k = int(10·ln L)) of
   `corr` aggregate rolled V ("time delay agg", train variant uses
   batch-shared delays, inference per-row delays; `fearec.py:253-303`).
2. *Dual-domain branch*: band-limited reconstructions of Q/K/V run
   standard masked attention (`fearec.py:332-409`); branches blend as
   `(1-spatial_ratio)·autocorr + spatial_ratio·spatial`.
3. Output dense + dropout + LN(x + res), then shared FeedForward.

Loss = full-vocab CE + DuoRec-style InfoNCE terms + optional
frequency-domain L1 regularization between views (`fearec.py:131-143`).

TPU-first realization: every rfft/band/irfft map here is linear on the
static 50-long sequence axis, so the band transforms are cached real
matrices (`ops.frequency.bandpass_matrices`) applied as small MXU
matmuls — no complex dtype in the layer. Only the fredom term keeps an
actual rfft (over the hidden axis of the final states).
"""

from __future__ import annotations

import math

import flax.linen as nn

from bsarec_tpu.core.dropout import FastDropout
import jax
import jax.numpy as jnp

from bsarec_tpu.models.base import SequentialRecModel
from bsarec_tpu.models.modules import (
    EncoderConfig,
    FeedForward,
    TFLayerNorm,
    normal_init,
)
from bsarec_tpu.ops.frequency import bandpass_matrices
from bsarec_tpu.ops.losses import full_softmax_ce, info_nce_logits


def fearec_band(cfg: EncoderConfig, global_ratio: float, layer: int) -> tuple[int, int]:
    """Per-layer frequency window [left, right) (`fearec.py:216-249`)."""
    nfreq = cfg.max_seq_length // 2 + 1
    n_layers = cfg.num_hidden_layers
    if global_ratio > 1.0 / n_layers:
        w = global_ratio
        s = (nfreq * (1 - global_ratio)) // (n_layers - 1) if n_layers > 1 else 0
    else:
        w = 1.0 / n_layers
        s = w * nfreq
    left = int((nfreq * (1 - w)) - layer * s)
    right = int(nfreq - layer * s)
    return left, right


def _delay_circulant(weights: jnp.ndarray, delay: jnp.ndarray, length: int) -> jnp.ndarray:
    """[B, L, L] circulant combine matrix C with
    C[b, l, m] = Σ_k weights[b, k] · 1[(m − l) mod L == delay[b or ·, k]],
    so that einsum('bhdm,blm->bhdl', V, C) == Σ_k w_k · roll(V, -δ_k).

    The reference (and our round-1 port) materializes the rolled values
    as a [B, h, d, k, L] tensor (`fearec.py:253-303`) — 5.4 GB per layer
    at L=200/d=128/B=256, which hard-crashes the TPU worker. The delay
    sum is a circular convolution, so we scatter the k weights into a
    [B, L] lag profile and gather it into a circulant matrix: O(B·L²)
    memory and one MXU matmul instead of a giant gather."""
    b = weights.shape[0]
    lag_profile = jnp.zeros((b, length), weights.dtype)
    if delay.ndim == 1:  # shared delays (train variant)
        lag_profile = lag_profile.at[:, delay].add(weights)
    else:  # per-row delays (infer variant)
        rows = jnp.arange(b)[:, None]
        lag_profile = lag_profile.at[rows, delay].add(weights)
    pos = jnp.arange(length)
    diff = (pos[None, :] - pos[:, None]) % length  # [L, L]: (m - l) mod L
    return lag_profile[:, diff]  # [B, L, L]


def time_delay_agg_train(values: jnp.ndarray, corr: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Batch-shared top-k delay aggregation (`fearec.py:253-274`).

    values/corr: [B, h, d, L]. Delays are the top-k lags of the
    batch-mean correlation; weights softmax over per-row correlations.
    """
    length = values.shape[-1]
    mean_value = jnp.mean(corr, axis=(1, 2))  # [B, L]
    _, index = jax.lax.top_k(jnp.mean(mean_value, axis=0), top_k)  # [k]
    weights = mean_value[:, index]  # [B, k]
    tmp_corr = jax.nn.softmax(weights, axis=-1)
    comb = _delay_circulant(tmp_corr, index, length)
    return jnp.einsum("bhdm,blm->bhdl", values, comb)


def time_delay_agg_infer(values: jnp.ndarray, corr: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Per-row top-k delay aggregation (`fearec.py:276-303`)."""
    length = values.shape[-1]
    mean_value = jnp.mean(corr, axis=(1, 2))  # [B, L]
    weights, delay = jax.lax.top_k(mean_value, top_k)  # [B, k]
    tmp_corr = jax.nn.softmax(weights, axis=-1)
    comb = _delay_circulant(tmp_corr, delay, length)
    return jnp.einsum("bhdm,blm->bhdl", values, comb)


class FEARecLayer(nn.Module):
    config: EncoderConfig
    global_ratio: float
    spatial_ratio: float
    layer_num: int
    factor: int = 10

    @nn.compact
    def __call__(self, x, attention_mask, *, train: bool):
        cfg = self.config
        heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // heads
        batch, seq_len, _ = x.shape
        init = normal_init(cfg.initializer_range)

        def proj(name):
            y = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=cfg.compute_dtype, name=name)(x)
            # [B, h, d, L] — lag axis last for the spectral matmuls
            return y.reshape(batch, seq_len, heads, head_dim).transpose(0, 2, 3, 1)

        q, k, v = proj("query"), proj("key"), proj("value")

        left, right = fearec_band(cfg, self.global_ratio, self.layer_num)
        r_re, r_im, a_re, a_im, bp = (
            jnp.asarray(m) for m in bandpass_matrices(seq_len, left, right)
        )

        # -- autocorrelation branch (band-limited cross-power -> lags) --
        q_re = jnp.einsum("fl,bhdl->bhdf", r_re, q)
        q_im = jnp.einsum("fl,bhdl->bhdf", r_im, q)
        k_re = jnp.einsum("fl,bhdl->bhdf", r_re, k)
        k_im = jnp.einsum("fl,bhdl->bhdf", r_im, k)
        prod_re = q_re * k_re + q_im * k_im  # Re(q·conj(k))
        prod_im = q_im * k_re - q_re * k_im  # Im(q·conj(k))
        corr = jnp.einsum("lf,bhdf->bhdl", a_re, prod_re) + jnp.einsum(
            "lf,bhdf->bhdl", a_im, prod_im
        )

        # clamp: int(factor*log(L)) can exceed L for tiny test sequences
        # (the reference would crash there too — `fearec.py:259`)
        top_k = min(int(self.factor * math.log(seq_len)), seq_len)
        agg = time_delay_agg_train if train else time_delay_agg_infer
        v_agg = agg(v, corr, top_k)  # [B, h, d, L]
        context = v_agg.transpose(0, 3, 1, 2).reshape(batch, seq_len, cfg.hidden_size)

        # -- dual-domain branch: attention over band-limited signals --
        qt = jnp.einsum("kl,bhdl->bhkd", bp, q)  # [B, h, L, d]
        kt = jnp.einsum("kl,bhdl->bhkd", bp, k)
        vt = jnp.einsum("kl,bhdl->bhkd", bp, v)
        scores = jnp.einsum("bhld,bhmd->bhlm", qt, kt, preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(head_dim)) + attention_mask
        probs = jax.nn.softmax(scores, axis=-1)
        probs = FastDropout(cfg.attention_probs_dropout_prob, deterministic=not train)(probs)
        ctx_sp = jnp.einsum("bhlm,bhmd->bhld", probs, vt)
        ctx_sp = ctx_sp.transpose(0, 2, 1, 3).reshape(batch, seq_len, cfg.hidden_size)

        context = (1.0 - self.spatial_ratio) * context + self.spatial_ratio * ctx_sp

        out = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=cfg.compute_dtype, name="dense")(context)
        out = FastDropout(cfg.hidden_dropout_prob, deterministic=not train)(out)
        return TFLayerNorm(name="LayerNorm")(out + x)


class FEARecBlock(nn.Module):
    config: EncoderConfig
    global_ratio: float
    spatial_ratio: float
    layer_num: int

    @nn.compact
    def __call__(self, x, attention_mask, *, train: bool):
        x = FEARecLayer(
            self.config, self.global_ratio, self.spatial_ratio, self.layer_num, name="layer"
        )(x, attention_mask, train=train)
        return FeedForward(self.config, name="feed_forward")(x, train=train)


class FEARecModel(SequentialRecModel):
    def setup_model(self):
        cfg = self.encoder_config
        self.blocks = [
            FEARecBlock(cfg, self.config.global_ratio, self.config.spatial_ratio, i, name=f"block_{i}")
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
        cfg = self.config
        seq_output = self.forward(input_ids, train=train)[:, -1, :]
        loss = full_softmax_ce(seq_output, self.item_table, answers, impl=self.config.loss_impl, dtype=self.config.compute_dtype)

        aug_full = sem_full = None
        if cfg.ssl in ("us", "un"):
            aug_full = self.forward(input_ids, train=train)
            loss += cfg.lmd * info_nce_logits(
                seq_output, aug_full[:, -1, :], cfg.tau, cfg.sim
            )
        if cfg.ssl in ("us", "su"):
            sem_full = self.forward(same_target, train=train)
            loss += cfg.lmd_sem * info_nce_logits(
                seq_output, sem_full[:, -1, :], cfg.tau, cfg.sim
            )
        if cfg.ssl == "us_x":
            aug_full = self.forward(input_ids, train=train)
            sem_full = self.forward(same_target, train=train)
            loss += cfg.lmd_sem * info_nce_logits(
                aug_full[:, -1, :], sem_full[:, -1, :], cfg.tau, cfg.sim
            )

        if cfg.fredom:
            # reference (`fearec.py:131-143`): rfft(·, dim=1, norm=ortho)
            # then mean |Δ| — but seq_output is the LAST-POSITION [B, H]
            # state while aug/sem stay FULL [B, L, H] sequence outputs,
            # so only the us_x pairing (aug vs sem, both [B, L, H], time
            # axis) is shape-consistent; every other fredom_type crashes
            # in the reference. We reproduce us_x exactly and keep the
            # other types well-defined on last-position states (hidden
            # axis) as a documented extension.
            from bsarec_tpu.ops.frequency import rfft_real_imag

            def fre_l1(a, b):
                dre, dim = rfft_real_imag(a - b, axis=1)
                return jnp.mean(jnp.sqrt(dre**2 + dim**2 + 1e-12))

            if cfg.fredom_type in ("us", "un") and aug_full is not None:
                loss += 0.1 * fre_l1(seq_output, aug_full[:, -1, :])
            if cfg.fredom_type in ("us", "su") and sem_full is not None:
                loss += 0.1 * fre_l1(seq_output, sem_full[:, -1, :])
            if cfg.fredom_type == "us_x" and aug_full is not None and sem_full is not None:
                loss += 0.1 * fre_l1(aug_full, sem_full)
        return loss
