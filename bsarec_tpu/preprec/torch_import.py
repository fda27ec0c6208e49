"""Import PREPRec (repo-b) PyTorch checkpoints into our Flax trees.

The reference trains with `torch.save(model.state_dict())`
(`repo-b/train_test.py:265-281`) and transfers across domains by
loading that state-dict minus the popularity/positional buffers
(`repo-b/main.py:158-160`). Here the popularity tables live OUTSIDE
the param tree (`preprec/models.py` design note), so an imported
checkpoint transfers as-is; the buffer keys are simply skipped.

Key layouts mapped (all torch Linear kernels transposed [out, in] ->
[in, out]; conv1d k=1 weights [out, in, 1] -> [in, out]):
- NewRec      `repo-b/model.py:8-102`    (+ fs_layer, pos_emb variants)
- NewB4Rec    `repo-b/model.py:272-326`
- SASRec      `repo-b/model.py:437-473`
- BERT4Rec    `repo-b/model.py:527-567`
- BPRMF       `repo-b/model.py:412-418`
- CL4SRec     `repo-b/model.py:628-666`
"""

from __future__ import annotations

# state-dict normalization and Linear transpose are shared with the
# src-zoo importer; only _ln differs (flax nn.LayerNorm uses 'scale',
# the src zoo's TFLayerNorm uses 'weight')
from bsarec_tpu.train.torch_import import _dense, _load_state_dict as _sd


def _ln(sd, prefix):
    # flax nn.LayerNorm parameter names
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _conv1(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"][:, :, 0].T, "bias": sd[f"{prefix}.bias"]}


def _init_ffn(sd, prefix):
    return {"fc1": _dense(sd, f"{prefix}.fc1"), "fc2": _dense(sd, f"{prefix}.fc2")}


def _sasrec_backbone(sd, num_blocks: int) -> dict:
    """Pre-LN causal tower (`model.py:75-99,126-152`) -> `SASRecBackbone`."""
    bb = {}
    for i in range(num_blocks):
        bb[f"attn_ln_{i}"] = _ln(sd, f"attention_layernorms.{i}")
        bb[f"attn_{i}"] = {
            "Q_w": _dense(sd, f"attention_layers.{i}.Q_w"),
            "K_w": _dense(sd, f"attention_layers.{i}.K_w"),
            "V_w": _dense(sd, f"attention_layers.{i}.V_w"),
        }
        bb[f"ffn_ln_{i}"] = _ln(sd, f"forward_layernorms.{i}")
        bb[f"ffn_{i}"] = {
            "conv1": _conv1(sd, f"forward_layers.{i}.conv1"),
            "conv2": _conv1(sd, f"forward_layers.{i}.conv2"),
        }
    bb["last_ln"] = _ln(sd, "last_layernorm")
    return bb


def _bert_blocks(sd, num_blocks: int) -> dict:
    """BERT-style blocks (`model.py:308-326,543-567`)."""
    p = {}
    for i in range(num_blocks):
        p[f"attn_ln_{i}"] = _ln(sd, f"attention_layernorms.{i}")
        p[f"attn_{i}"] = {
            "q": _dense(sd, f"attention_layers.{i}.linear_layers.0"),
            "k": _dense(sd, f"attention_layers.{i}.linear_layers.1"),
            "v": _dense(sd, f"attention_layers.{i}.linear_layers.2"),
            "out": _dense(sd, f"attention_layers.{i}.output_linear"),
        }
        p[f"ffn_ln_{i}"] = _ln(sd, f"forward_layernorms.{i}")
        p[f"ffn_{i}"] = {
            "w_1": _dense(sd, f"forward_layers.{i}.w_1"),
            "w_2": _dense(sd, f"forward_layers.{i}.w_2"),
        }
    p["out"] = _dense(sd, "out")
    return p


def import_newrec(path_or_sd, num_blocks: int = 2) -> dict:
    sd = _sd(path_or_sd)
    params = {
        "embed_layer": _init_ffn(sd, "embed_layer"),
        "backbone": _sasrec_backbone(sd, num_blocks),
    }
    if "fs_layer.fc1.weight" in sd:
        params["fs_layer"] = _init_ffn(sd, "fs_layer")
    if "pos_emb.weight" in sd:
        params["pos_emb"] = {"embedding": sd["pos_emb.weight"]}
    if "time_pos_emb.weight" in sd:
        params["time_pos_emb"] = {"embedding": sd["time_pos_emb.weight"]}
    return params


def import_newb4rec(path_or_sd, num_blocks: int = 2) -> dict:
    sd = _sd(path_or_sd)
    params = {"embed_layer": _init_ffn(sd, "embed_layer")}
    params.update(_bert_blocks(sd, num_blocks))
    if "pos_emb.weight" in sd:
        params["pos_emb"] = {"embedding": sd["pos_emb.weight"]}
    return params


def import_sasrec_b(path_or_sd, num_blocks: int = 2) -> dict:
    sd = _sd(path_or_sd)
    return {
        "item_emb": {"embedding": sd["item_emb.weight"]},
        "pos_emb": {"embedding": sd["pos_emb.weight"]},
        "backbone": _sasrec_backbone(sd, num_blocks),
    }


def import_bert4rec_b(path_or_sd, num_blocks: int = 2) -> dict:
    sd = _sd(path_or_sd)
    params = {
        "item_emb": {"embedding": sd["item_emb.weight"]},
        "pos_emb": {"embedding": sd["pos_emb.weight"]},
    }
    params.update(_bert_blocks(sd, num_blocks))
    return params


def import_bprmf(path_or_sd, num_blocks: int = 0) -> dict:
    sd = _sd(path_or_sd)
    return {
        "user_emb": {"embedding": sd["user_emb.weight"]},
        "item_emb": {"embedding": sd["item_emb.weight"]},
    }


def import_cl4srec(path_or_sd, num_blocks: int = 2) -> dict:
    return import_sasrec_b(path_or_sd, num_blocks)


PREPREC_TORCH_IMPORTERS = {
    "newrec": import_newrec,
    "newb4rec": import_newb4rec,
    "sasrec": import_sasrec_b,
    "bert4rec": import_bert4rec_b,
    "bprmf": import_bprmf,
    "cl4srec": import_cl4srec,
}


def import_preprec_torch(model: str, path_or_sd, num_blocks: int = 2) -> dict:
    return PREPREC_TORCH_IMPORTERS[model.lower()](path_or_sd, num_blocks)
