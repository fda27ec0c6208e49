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


def _load_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu")
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


TORCH_IMPORTERS = {
    "bsarec": import_bsarec,
    "sasrec": import_sasrec,
    "bert4rec": import_bert4rec,
    "fmlprec": import_fmlprec,
}


def import_torch_checkpoint(model_type: str, path: str, num_layers: int = 2) -> dict:
    return TORCH_IMPORTERS[model_type.lower()](path, num_layers)
