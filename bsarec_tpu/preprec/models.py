"""PREPRec model zoo (Flax), TPU-first.

Design split vs the reference (`repo-b/model.py`, `model_utils.py`):
popularity features are gathered OUTSIDE the models (see
`popularity.py`) and passed in as dense inputs. That keeps parameters
popularity-free — which is exactly the transfer contract (the
reference drops `popularity_enc.*` / `position_enc.*` buffers when
loading across domains, `repo-b/main.py:158-160`); here there is
nothing to drop, any checkpoint transfers as-is.

Numerics contracts:
- SASRec-style backbone (`model.py:97-152,497-523`): pre-LN query
  attention (Q = LN(x), K = V = x), no output projection, residual
  Q + attn, LN -> conv1d-style FFN (dense/dropout/relu/dense/dropout,
  residual), padded positions re-zeroed each layer, final LN; masking
  uses -(2^32-1) and LayerNorm eps=1e-8.
- BERT-style blocks (`model.py:335-365,575-600`): bidirectional MHA
  with output linear, masked_fill(-1e9), tanh-GELU 4x FFN, final
  `out` dense.
- Init follows the reference's EFFECTIVE scheme: repo-b re-initializes
  every parameter with `torch.nn.init.xavier_normal_` inside a bare
  try/except (`repo-b/main.py:126-135`) — xavier raises on tensors
  with <2 dims, so all >=2-D params (Linear kernels, Embedding tables,
  attention projections) become N(0, 2/(fan_in+fan_out)) while 1-D
  params (biases, LayerNorms) keep their module defaults; the
  explicitly-zeroed names are `embed_layer.fc1.bias` (done in
  `train.py:_init_params`) and `embed_layer.fc12.bias` (matches no
  parameter — fc2 is the real second layer — so it is dead code).
  Set BSAREC_PREPREC_INIT=torch to ablate back to pure torch defaults
  (kaiming-uniform kernels, N(0,1) embeddings) — the r4 head-to-head
  configuration whose trained legs beat the reference 2.5x.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from bsarec_tpu.preprec.config import PrepRecConfig
from bsarec_tpu.preprec.popularity import sinusoid_table

NEG_BIG = -(2.0**32) + 1


def _init_scheme() -> str:
    """"xavier" = reference-effective (repo-b/main.py:126-135);
    "torch" = plain torch module defaults (ablation)."""
    return os.environ.get("BSAREC_PREPREC_INIT", "xavier")


def torch_kaiming_uniform(fan_in: int):
    bound = float(np.sqrt(1.0 / fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _xavier_normal(key, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_normal_: N(0, 2/(fan_in+fan_out)). torch's
    fan pair for a 2-D tensor is (size(1), size(0)) — the std depends
    only on the SUM, so axis order is irrelevant."""
    std = float(np.sqrt(2.0 / (shape[-2] + shape[-1])))
    return std * jax.random.normal(key, shape, dtype)


def torch_dense(features: int, in_features: int, name: str) -> nn.Dense:
    kernel = _xavier_normal if _init_scheme() == "xavier" else torch_kaiming_uniform(in_features)
    return nn.Dense(
        features,
        kernel_init=kernel,
        # biases are 1-D: xavier_normal_ raises and the reference's
        # except keeps the torch Linear default
        bias_init=torch_kaiming_uniform(in_features),
        name=name,
    )


def torch_embed(num: int, dim: int, name: str, zero_pad: bool = False) -> nn.Embed:
    def init(key, shape, dtype=jnp.float32):
        if _init_scheme() == "xavier":
            table = _xavier_normal(key, shape, dtype)
        else:
            table = jax.random.normal(key, shape, dtype)
        # the reference's xavier sweep overwrites padding_idx row 0 with
        # noise too, but every consumer masks padded positions (timeline
        # mask / re-zeroing per layer); keeping row 0 at zero is the
        # cleaner equivalent
        return table.at[0].set(0.0) if zero_pad else table

    return nn.Embed(num, dim, embedding_init=init, name=name)


class InitFeedForward(nn.Module):
    """Popularity features -> hidden (`model_utils.py:71-82`)."""

    hidden1: int
    hidden2: int
    in_features: int

    @nn.compact
    def __call__(self, x):
        x = torch_dense(self.hidden1, self.in_features, "fc1")(x)
        x = jax.nn.relu(x)
        return torch_dense(self.hidden2, self.hidden1, "fc2")(x)


class CausalSelfAttention(nn.Module):
    """TiSASRec-style causal MHA, no output projection
    (`model_utils.py:99-149`)."""

    hidden: int
    heads: int
    dropout: float

    @nn.compact
    def __call__(self, q_in, kv_in, pad_mask, *, train: bool):
        # pad_mask: [B, T] True where padding (query rows masked)
        h, d = self.heads, self.hidden // self.heads
        b, t, _ = q_in.shape
        q = torch_dense(self.hidden, self.hidden, "Q_w")(q_in)
        k = torch_dense(self.hidden, self.hidden, "K_w")(kv_in)
        v = torch_dense(self.hidden, self.hidden, "V_w")(kv_in)

        def split(x):
            return x.reshape(b, t, h, d).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhld,bhmd->bhlm", q, k, preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(d))
        causal = jnp.triu(jnp.ones((t, t), bool), k=1)
        scores = jnp.where(pad_mask[:, None, :, None], NEG_BIG, scores)  # query rows
        scores = jnp.where(causal[None, None], NEG_BIG, scores)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
        out = jnp.einsum("bhlm,bhmd->bhld", probs, v)
        return out.transpose(0, 2, 1, 3).reshape(b, t, self.hidden)


class BidirAttention(nn.Module):
    """BERT-style MHA with output linear (`model_utils.py:153-196`)."""

    hidden: int
    heads: int
    dropout: float

    @nn.compact
    def __call__(self, x, key_valid, *, train: bool):
        # key_valid: [B, T] True where a real token
        h, d = self.heads, self.hidden // self.heads
        b, t, _ = x.shape
        qkv = [
            torch_dense(self.hidden, self.hidden, n)(x).reshape(b, t, h, d).transpose(0, 2, 1, 3)
            for n in ("q", "k", "v")
        ]
        q, k, v = qkv
        scores = jnp.einsum("bhld,bhmd->bhlm", q, k) / jnp.sqrt(jnp.float32(d))
        scores = jnp.where(key_valid[:, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
        out = jnp.einsum("bhlm,bhmd->bhld", probs, v).transpose(0, 2, 1, 3).reshape(b, t, self.hidden)
        return torch_dense(self.hidden, self.hidden, "out")(out)


class ConvFFN(nn.Module):
    """conv1d(k=1) FFN with internal residual (`model_utils.py:9-25`)."""

    hidden: int
    dropout: float

    @nn.compact
    def __call__(self, x, *, train: bool):
        h = torch_dense(self.hidden, self.hidden, "conv1")(x)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = jax.nn.relu(h)
        h = torch_dense(self.hidden, self.hidden, "conv2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h + x


class GeluFFN(nn.Module):
    """tanh-GELU 4x FFN (`model_utils.py:29-44`)."""

    hidden: int
    dropout: float

    @nn.compact
    def __call__(self, x, *, train: bool):
        h = torch_dense(4 * self.hidden, self.hidden, "w_1")(x)
        h = 0.5 * h * (1 + jnp.tanh(np.sqrt(2 / np.pi) * (h + 0.044715 * h**3)))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return torch_dense(self.hidden, 4 * self.hidden, "w_2")(h)


class SASRecBackbone(nn.Module):
    """Pre-LN causal tower (`model.py:126-152`)."""

    hidden: int
    blocks: int
    heads: int
    dropout: float

    @nn.compact
    def __call__(self, seqs, pad_mask, *, train: bool):
        seqs = seqs * (~pad_mask)[..., None]
        for i in range(self.blocks):
            q = nn.LayerNorm(epsilon=1e-8, name=f"attn_ln_{i}")(seqs)
            attn = CausalSelfAttention(self.hidden, self.heads, self.dropout, name=f"attn_{i}")(
                q, seqs, pad_mask, train=train
            )
            seqs = q + attn
            seqs = nn.LayerNorm(epsilon=1e-8, name=f"ffn_ln_{i}")(seqs)
            seqs = ConvFFN(self.hidden, self.dropout, name=f"ffn_{i}")(seqs, train=train)
            seqs = seqs * (~pad_mask)[..., None]
        return nn.LayerNorm(epsilon=1e-8, name="last_ln")(seqs)


class NewRecModel(nn.Module):
    """PREPRec / NewRec (`model.py:8-269`): popularity features in,
    per-position pairwise logits out. Feature gathers happen outside."""

    config: PrepRecConfig

    def setup(self):
        cfg = self.config
        self.embed_layer = InitFeedForward(
            cfg.hidden_units * 2, cfg.hidden_units,
            cfg.input_units1 + cfg.input_units2, name="embed_layer",
        )
        if cfg.fs_emb:
            # few-shot adapter after the popularity embed (model.py:43-49);
            # applied on the sequence path only (model.py:99-101), not on
            # candidate features
            self.fs_layer = InitFeedForward(
                cfg.hidden_units * 2, cfg.hidden_units, cfg.hidden_units,
                name="fs_layer",
            )
        if cfg.no_fixed_emb:
            self.pos_emb = torch_embed(cfg.maxlen, cfg.hidden_units, "pos_emb")
        if cfg.time_embed and cfg.time_no_fixed_embed:
            self.time_pos_emb = torch_embed(cfg.maxlen + 1, cfg.hidden_units, "time_pos_emb")
        self.backbone = SASRecBackbone(
            cfg.hidden_units, cfg.num_blocks, cfg.num_heads, cfg.dropout_rate, name="backbone"
        )

    def embed_feats(self, feats):
        return self.embed_layer(feats)

    def encode(self, seq_feats, pad_mask, time_embed_ids=None, *, train: bool = False):
        cfg = self.config
        seqs = self.embed_layer(seq_feats)
        if cfg.fs_emb:
            seqs = self.fs_layer(seqs)
        t = seqs.shape[1]
        if cfg.no_fixed_emb:
            seqs = seqs + self.pos_emb(jnp.arange(t))[None]
        elif not cfg.no_emb:
            seqs = seqs + jnp.asarray(sinusoid_table(cfg.maxlen, cfg.hidden_units))[None, :t]
        if cfg.time_embed and time_embed_ids is not None:
            if cfg.time_no_fixed_embed:
                te = self.time_pos_emb(time_embed_ids)
            else:
                table = jnp.asarray(sinusoid_table(cfg.maxlen + 1, cfg.hidden_units))
                te = table[time_embed_ids]
            if cfg.time_embed_concat:
                # interleave (seq, time) along the time axis (model.py:117-124)
                seqs = jnp.stack([seqs, te], axis=2).reshape(seqs.shape[0], -1, seqs.shape[2])
                pad_mask = jnp.repeat(pad_mask, 2, axis=1)
            else:
                seqs = seqs + te
        out = self.backbone(seqs, pad_mask, train=train)
        if cfg.time_embed and cfg.time_embed_concat:
            out = out[:, 0 :: 2]
        return out

    def __call__(self, seq_feats, pad_mask, pos_feats, neg_feats, time_embed_ids=None, *, train: bool = True):
        feats = self.encode(seq_feats, pad_mask, time_embed_ids, train=train)
        pos_logits = jnp.sum(feats * self.embed_feats(pos_feats), axis=-1)
        neg_logits = jnp.sum(feats * self.embed_feats(neg_feats), axis=-1)
        return pos_logits, neg_logits, feats

    def predict(self, seq_feats, pad_mask, cand_feats, time_embed_ids=None):
        """cand_feats: [B, C, F] popularity features of candidates."""
        feats = self.encode(seq_feats, pad_mask, time_embed_ids, train=False)
        final = feats[:, -1, :]
        cand = self.embed_feats(cand_feats)
        return jnp.einsum("bcf,bf->bc", cand, final)


class SASRecB(nn.Module):
    """pmixer SASRec (`model.py:437-523`): per-position pairwise BCE."""

    config: PrepRecConfig

    def setup(self):
        cfg = self.config
        self.item_emb = torch_embed(cfg.itemnum + 1, cfg.hidden_units, "item_emb", zero_pad=True)
        self.pos_emb = torch_embed(cfg.maxlen, cfg.hidden_units, "pos_emb")
        self.emb_dropout = nn.Dropout(cfg.dropout_rate)
        self.backbone = SASRecBackbone(
            cfg.hidden_units, cfg.num_blocks, cfg.num_heads, cfg.dropout_rate, name="backbone"
        )

    def encode(self, log_seqs, *, train: bool = False):
        cfg = self.config
        seqs = self.item_emb(log_seqs) * np.sqrt(cfg.hidden_units)
        seqs = seqs + self.pos_emb(jnp.arange(log_seqs.shape[1]))[None]
        seqs = self.emb_dropout(seqs, deterministic=not train)
        return self.backbone(seqs, log_seqs == 0, train=train)

    def __call__(self, log_seqs, pos_seqs, neg_seqs, *, train: bool = True):
        feats = self.encode(log_seqs, train=train)
        pos_logits = jnp.sum(feats * self.item_emb(pos_seqs), axis=-1)
        neg_logits = jnp.sum(feats * self.item_emb(neg_seqs), axis=-1)
        return pos_logits, neg_logits

    def predict(self, log_seqs, item_indices):
        final = self.encode(log_seqs, train=False)[:, -1, :]
        return jnp.einsum("bcf,bf->bc", self.item_emb(item_indices), final)


class BERT4RecB(nn.Module):
    """repo-b BERT4Rec (`model.py:527-624`): cloze with token 0 as
    mask, full-vocab CE (ignore_index=0)."""

    config: PrepRecConfig

    def setup(self):
        cfg = self.config
        self.item_emb = torch_embed(cfg.itemnum + 1, cfg.hidden_units, "item_emb", zero_pad=True)
        self.pos_emb = torch_embed(cfg.maxlen, cfg.hidden_units, "pos_emb")
        self.emb_dropout = nn.Dropout(cfg.dropout_rate)
        cfgh = cfg.hidden_units
        self.attn_lns = [nn.LayerNorm(epsilon=1e-8, name=f"attn_ln_{i}") for i in range(cfg.num_blocks)]
        self.attns = [
            BidirAttention(cfgh, cfg.num_heads, cfg.dropout_rate, name=f"attn_{i}")
            for i in range(cfg.num_blocks)
        ]
        self.ffn_lns = [nn.LayerNorm(epsilon=1e-8, name=f"ffn_ln_{i}") for i in range(cfg.num_blocks)]
        self.ffns = [
            GeluFFN(cfgh, cfg.dropout_rate, name=f"ffn_{i}") for i in range(cfg.num_blocks)
        ]
        self.out = torch_dense(cfgh, cfgh, "out")

    def encode(self, log_seqs, *, train: bool = False):
        cfg = self.config
        valid = log_seqs > 0
        seqs = self.item_emb(log_seqs) * np.sqrt(cfg.hidden_units)
        seqs = seqs + self.pos_emb(jnp.arange(log_seqs.shape[1]))[None]
        seqs = self.emb_dropout(seqs, deterministic=not train)
        for ln, attn, fln, ffn in zip(self.attn_lns, self.attns, self.ffn_lns, self.ffns):
            q = ln(seqs)
            seqs = q + attn(q, valid, train=train)
            seqs = fln(seqs)
            seqs = ffn(seqs, train=train)
        return self.out(seqs)

    def __call__(self, log_seqs, *, train: bool = True):
        """Full-vocab logits at every position: [B, T, V+1]."""
        feats = self.encode(log_seqs, train=train)
        return jnp.einsum("btf,vf->btv", feats, self.item_emb.embedding)

    def predict(self, log_seqs, candidates):
        logits = self(log_seqs, train=False)[:, -1, :]  # [B, V+1]
        return jnp.take_along_axis(logits, candidates, axis=1)


class NewB4Rec(nn.Module):
    """Popularity-encoded BERT4Rec (`model.py:272-408`) with sampled
    softmax over `loss_size` random candidates.

    Note: the reference's `log2feats` OVERWRITES the embedded sequence
    with the positional table when fixed encodings are used
    (`model.py:353`, `seqs = self.position_enc(seqs)` — an apparent
    typo for `+=`). We implement the additive behavior and document
    the divergence.
    """

    config: PrepRecConfig

    def setup(self):
        cfg = self.config
        self.embed_layer = InitFeedForward(
            cfg.hidden_units * 2, cfg.hidden_units,
            cfg.input_units1 + cfg.input_units2, name="embed_layer",
        )
        if cfg.no_fixed_emb:
            self.pos_emb = torch_embed(cfg.maxlen, cfg.hidden_units, "pos_emb")
        cfgh = cfg.hidden_units
        self.attn_lns = [nn.LayerNorm(epsilon=1e-8, name=f"attn_ln_{i}") for i in range(cfg.num_blocks)]
        self.attns = [
            BidirAttention(cfgh, cfg.num_heads, cfg.dropout_rate, name=f"attn_{i}")
            for i in range(cfg.num_blocks)
        ]
        self.ffn_lns = [nn.LayerNorm(epsilon=1e-8, name=f"ffn_ln_{i}") for i in range(cfg.num_blocks)]
        self.ffns = [
            GeluFFN(cfgh, cfg.dropout_rate, name=f"ffn_{i}") for i in range(cfg.num_blocks)
        ]
        self.out = torch_dense(cfgh, cfgh, "out")

    def embed_feats(self, feats):
        return self.embed_layer(feats)

    def encode(self, seq_feats, valid, *, train: bool = False):
        cfg = self.config
        seqs = self.embed_layer(seq_feats)
        t = seqs.shape[1]
        if cfg.no_fixed_emb:
            seqs = seqs + self.pos_emb(jnp.arange(t))[None]
        else:
            seqs = seqs + jnp.asarray(sinusoid_table(cfg.maxlen, cfg.hidden_units))[None, :t]
        for ln, attn, fln, ffn in zip(self.attn_lns, self.attns, self.ffn_lns, self.ffns):
            q = ln(seqs)
            seqs = q + attn(q, valid, train=train)
            seqs = fln(seqs)
            seqs = ffn(seqs, train=train)
        feats = self.out(seqs)
        return 0.5 * feats * (1 + jnp.tanh(np.sqrt(2 / np.pi) * (feats + 0.044715 * feats**3)))

    def __call__(self, seq_feats, valid, cand_feats, *, train: bool = True):
        """cand_feats: [B, T, C, F] -> RAW candidate logits [B, T, C].

        The reference then applies `LogSoftmax(dim=1)` — the TIME axis
        of this [B, T, C] tensor (`model.py:295,398`), a shape quirk its
        CrossEntropyLoss does not cancel — before the sampled CE. That
        reference-exact normalization lives in the trainer
        (`preprec/train.py:newb4rec_loss`), keeping the model output
        reusable (predict scores are raw in the reference too)."""
        feats = self.encode(seq_feats, valid, train=train)
        cand = self.embed_layer(cand_feats)
        return jnp.einsum("btcf,btf->btc", cand, feats)

    def predict(self, seq_feats, valid, cand_feats):
        """cand_feats: [B, C, F] candidates at the last position."""
        feats = self.encode(seq_feats, valid, train=False)[:, -1, :]
        cand = self.embed_layer(cand_feats)
        return jnp.einsum("bcf,bf->bc", cand, feats)


class BPRMF(nn.Module):
    """Matrix factorization with BPR loss (`model.py:412-433`)."""

    config: PrepRecConfig

    def setup(self):
        cfg = self.config
        self.user_emb = torch_embed(cfg.usernum + 1, cfg.hidden_units, "user_emb")
        self.item_emb = torch_embed(cfg.itemnum + 1, cfg.hidden_units, "item_emb")

    def __call__(self, users, pos_items, neg_items, *, train: bool = True):
        u = self.user_emb(users)  # [B, H]
        pi = self.item_emb(pos_items)  # [B, S, H]
        ni = self.item_emb(neg_items)
        return jnp.einsum("bsh,bh->bs", pi, u), jnp.einsum("bsh,bh->bs", ni, u)

    def predict(self, users, item_indices):
        u = self.user_emb(users)
        items = self.item_emb(item_indices)
        return jnp.einsum("bch,bh->bc", items, u)


class CL4SRec(nn.Module):
    """SASRec backbone + crop/mask/reorder InfoNCE (`model.py:628-803`).
    Augmented views are produced by the host pipeline (vectorized
    numpy) and passed in; the InfoNCE matches `ops.losses`."""

    config: PrepRecConfig

    def setup(self):
        cfg = self.config
        self.item_emb = torch_embed(cfg.itemnum + 1, cfg.hidden_units, "item_emb", zero_pad=True)
        self.pos_emb = torch_embed(cfg.maxlen, cfg.hidden_units, "pos_emb")
        self.emb_dropout = nn.Dropout(cfg.dropout_rate)
        self.backbone = SASRecBackbone(
            cfg.hidden_units, cfg.num_blocks, cfg.num_heads, cfg.dropout_rate, name="backbone"
        )

    def encode(self, log_seqs, *, train: bool = False):
        cfg = self.config
        seqs = self.item_emb(log_seqs) * np.sqrt(cfg.hidden_units)
        seqs = seqs + self.pos_emb(jnp.arange(log_seqs.shape[1]))[None]
        seqs = self.emb_dropout(seqs, deterministic=not train)
        return self.backbone(seqs, log_seqs == 0, train=train)

    def __call__(self, log_seqs, aug1, aug2, pos_seqs, neg_seqs, *, train: bool = True):
        from bsarec_tpu.ops.losses import info_nce_logits

        feats = self.encode(log_seqs, train=train)
        pos_logits = jnp.sum(feats * self.item_emb(pos_seqs), axis=-1)
        neg_logits = jnp.sum(feats * self.item_emb(neg_seqs), axis=-1)
        z1 = self.encode(aug1, train=train)[:, -1, :]
        z2 = self.encode(aug2, train=train)[:, -1, :]
        aug_loss = info_nce_logits(z1, z2, temp=1.0, sim="dot")
        return pos_logits, neg_logits, aug_loss

    def predict(self, log_seqs, item_indices):
        final = self.encode(log_seqs, train=False)[:, -1, :]
        return jnp.einsum("bcf,bf->bc", self.item_emb(item_indices), final)


PREPREC_REGISTRY = {
    "newrec": NewRecModel,
    "newb4rec": NewB4Rec,
    "sasrec": SASRecB,
    "bert4rec": BERT4RecB,
    "bprmf": BPRMF,
    "cl4srec": CL4SRec,
}
