"""Import reference PyTorch checkpoints into bsarec_tpu params.

The reference ships trained state-dicts (`src/output/*.pt`,
re-evaluable via `--do_eval`, `src/main.py:37-48`). This module maps
those key layouts onto our Flax param trees (dense kernels transposed
from torch's [out, in]) so a user can bring existing checkpoints and —
more importantly — so tests can prove *eval-protocol fidelity*: our
on-device full-catalog eval on imported weights must reproduce the
reference's logged test metrics exactly.

Also provides the reverse of the reference's `beta`→`sqrt_beta`
key-compat shim (`src/trainers.py:47-60`): keys named `beta` load into
`sqrt_beta`.
"""

from __future__ import annotations

import numpy as np


def _load_state_dict(path_or_sd) -> dict:
    """Accepts a checkpoint path, a torch state-dict, or an already
    numpy-converted dict (the torch-parity tests pass live modules'
    state_dicts straight through)."""
    if isinstance(path_or_sd, dict):
        first = next(iter(path_or_sd.values()))
        if isinstance(first, np.ndarray):
            return path_or_sd
        return {k: np.asarray(v.detach().cpu().numpy()) for k, v in path_or_sd.items()}
    import torch

    sd = torch.load(path_or_sd, map_location="cpu")
    return {k: np.asarray(v.detach().numpy()) for k, v in sd.items()}


def _dense(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _ln(sd, prefix):
    return {"weight": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _mha(sd, prefix):
    return {
        "query": _dense(sd, f"{prefix}.query"),
        "key": _dense(sd, f"{prefix}.key"),
        "value": _dense(sd, f"{prefix}.value"),
        "dense": _dense(sd, f"{prefix}.dense"),
        "LayerNorm": _ln(sd, f"{prefix}.LayerNorm"),
    }


def _ffn(sd, prefix):
    return {
        "dense_1": _dense(sd, f"{prefix}.dense_1"),
        "dense_2": _dense(sd, f"{prefix}.dense_2"),
        "LayerNorm": _ln(sd, f"{prefix}.LayerNorm"),
    }


def _embeddings(sd):
    return {
        "item_embeddings": {"embedding": sd["item_embeddings.weight"]},
        "position_embeddings": {"embedding": sd["position_embeddings.weight"]},
        "emb_layer_norm": _ln(sd, "LayerNorm"),
    }


def import_bsarec(path: str, num_layers: int = 2) -> dict:
    """`BSARecModel.state_dict()` -> our param tree."""
    sd = _load_state_dict(path)
    params = _embeddings(sd)
    for i in range(num_layers):
        base = f"item_encoder.blocks.{i}"
        beta_key = f"{base}.layer.filter_layer.sqrt_beta"
        if beta_key not in sd:  # pre-rename checkpoints used 'beta'
            beta_key = f"{base}.layer.filter_layer.beta"
        params[f"block_{i}"] = {
            "layer": {
                "filter_layer": {
                    "sqrt_beta": sd[beta_key],
                    "LayerNorm": _ln(sd, f"{base}.layer.filter_layer.LayerNorm"),
                },
                "attention_layer": _mha(sd, f"{base}.layer.attention_layer"),
            },
            "feed_forward": _ffn(sd, f"{base}.feed_forward"),
        }
    return params


def import_sasrec(path: str, num_layers: int = 2) -> dict:
    sd = _load_state_dict(path)
    params = _embeddings(sd)
    enc = {}
    for i in range(num_layers):
        base = f"item_encoder.blocks.{i}"
        enc[f"block_{i}"] = {
            "attention": _mha(sd, f"{base}.layer"),
            "feed_forward": _ffn(sd, f"{base}.feed_forward"),
        }
    params["item_encoder"] = enc
    return params


def import_bert4rec(path: str, num_layers: int = 2) -> dict:
    return import_sasrec(path, num_layers)


def import_fmlprec(path: str, num_layers: int = 2) -> dict:
    sd = _load_state_dict(path)
    params = _embeddings(sd)
    for i in range(num_layers):
        base = f"item_encoder.blocks.{i}"
        cw = sd[f"{base}.layer.complex_weight"]  # [1, F, H, 2]
        params[f"block_{i}"] = {
            "layer": {
                "filter_real": cw[..., 0],
                "filter_imag": cw[..., 1],
                "LayerNorm": _ln(sd, f"{base}.layer.LayerNorm"),
            },
            "feed_forward": _ffn(sd, f"{base}.feed_forward"),
        }
    return params


def import_duorec(path: str, num_layers: int = 2) -> dict:
    """DuoRec shares SASRec's TransformerEncoder layout exactly
    (`src/model/duorec.py:16-36`)."""
    return import_sasrec(path, num_layers)


def import_gru4rec(path: str, num_layers: int = 1) -> dict:
    """`GRU4RecModel.state_dict()` (`src/model/gru4rec.py:17-39`) ->
    our param tree. torch nn.GRU packs gates row-wise as [3H, in] in
    (r, z, n) order; our GRULayer holds the transpose [in, 3H] with the
    same column-block order. The base class's unused position/LayerNorm
    entries are dropped (GRU4Rec's forward never touches them)."""
    sd = _load_state_dict(path)
    params = {"item_embeddings": {"embedding": sd["item_embeddings.weight"]}}
    for i in range(num_layers):
        params[f"gru_{i}"] = {
            "w_ih": sd[f"gru_layers.weight_ih_l{i}"].T,
            "w_hh": sd[f"gru_layers.weight_hh_l{i}"].T,
        }
    params["dense"] = _dense(sd, "dense")
    return params


def import_caser(path: str, max_seq_length: int = 50) -> dict:
    """`CaserModel.state_dict()` (`src/model/caser.py:17-64`) -> our
    param tree. Conv2d banks flatten to dense contractions: conv_h[i]
    [nh, 1, i+1, H] -> [(i+1)*H, nh] (row-major (height, H) window
    order matches our unfolded gather); conv_v [nv, 1, L, 1] -> [L, nv]."""
    sd = _load_state_dict(path)
    params = {
        "item_embeddings": {"embedding": sd["item_embeddings.weight"]},
        "user_embeddings": {"embedding": sd["user_embeddings.weight"]},
        "conv_v_kernel": sd["conv_v.weight"][:, 0, :, 0].T,
        "conv_v_bias": sd["conv_v.bias"],
        "fc1": _dense(sd, "fc1"),
        "fc2": _dense(sd, "fc2"),
    }
    for i in range(1, max_seq_length + 1):
        w = sd[f"conv_h.{i - 1}.weight"]  # [nh, 1, i, H]
        nh = w.shape[0]
        params[f"conv_h_{i}_kernel"] = w.reshape(nh, -1).T  # [(i)*H, nh]
        params[f"conv_h_{i}_bias"] = sd[f"conv_h.{i - 1}.bias"]
    return params


def import_fearec(path: str, num_layers: int = 2) -> dict:
    """`FEARecModel.state_dict()` (`src/model/fearec.py:17-40,181-206`)
    -> our param tree. Layer = {query,key,value,dense} Linears + LN;
    the frequency-band machinery is parameter-free."""
    sd = _load_state_dict(path)
    params = _embeddings(sd)
    for i in range(num_layers):
        base = f"item_encoder.blocks.{i}"
        params[f"block_{i}"] = {
            "layer": {
                "query": _dense(sd, f"{base}.layer.query"),
                "key": _dense(sd, f"{base}.layer.key"),
                "value": _dense(sd, f"{base}.layer.value"),
                "dense": _dense(sd, f"{base}.layer.dense"),
                "LayerNorm": _ln(sd, f"{base}.layer.LayerNorm"),
            },
            "feed_forward": _ffn(sd, f"{base}.feed_forward"),
        }
    return params


TORCH_IMPORTERS = {
    "bsarec": import_bsarec,
    "sasrec": import_sasrec,
    "bert4rec": import_bert4rec,
    "fmlprec": import_fmlprec,
    "duorec": import_duorec,
    "gru4rec": import_gru4rec,
    "caser": import_caser,
    "fearec": import_fearec,
}


def import_torch_checkpoint(model_type: str, path: str, num_layers: int = 2,
                            max_seq_length: int = 50) -> dict:
    # Caser's second parameter is the conv-bank count (max_seq_length),
    # not the layer count — dispatching num_layers there built a tree
    # missing most conv_h banks.
    mt = model_type.lower()
    if mt == "caser":
        return import_caser(path, max_seq_length)
    return TORCH_IMPORTERS[mt](path, num_layers)
