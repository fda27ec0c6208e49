"""Typed run configuration.

Replaces the reference's two-stage argparse Namespace
(`src/utils.py:51-127`): one frozen dataclass carries base + per-model
hyperparameters; the CLI fills it from flag-compatible arguments and
derived dataset fields (`item_size`, `num_users`) the way
`src/main.py:22-35` mutates its namespace.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    model_type: str = "bsarec"
    item_size: int = 0  # max item id + 1 (row 0 = padding)
    num_users: int = 0  # number of users + 1
    max_seq_length: int = 50
    hidden_size: int = 64
    num_hidden_layers: int = 2
    num_attention_heads: int = 2
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.5
    attention_probs_dropout_prob: float = 0.5
    initializer_range: float = 0.02
    # Mixed-precision policy (SURVEY.md §7 layer 1): matmuls/convs run in
    # this dtype ("bfloat16" on TPU keeps the MXU at full rate and halves
    # HBM traffic); params, LayerNorm, softmax and loss accumulation stay
    # float32. "float32" reproduces the reference bit-for-bit.
    compute_dtype: str = "float32"
    # --- bsarec ---
    c: int = 3
    alpha: float = 0.9
    # --- bert4rec ---
    mask_ratio: float = 0.2
    # --- caser ---
    nh: int = 8
    nv: int = 4
    reg_weight: float = 1e-4
    # --- duorec / fearec (contrastive) ---
    tau: float = 1.0
    lmd: float = 0.1
    lmd_sem: float = 0.1
    ssl: str = "us_x"
    sim: str = "dot"
    # --- fearec ---
    spatial_ratio: float = 0.1
    global_ratio: float = 0.6
    fredom_type: str = "us_x"
    fredom: bool = True
    # --- gru4rec ---
    gru_hidden_size: int = 64
    # "auto" | "dense" | "streaming": full-vocab CE implementation. The
    # trainer forces "dense" when the item table is vocab-sharded over a
    # mesh (pallas_call has no SPMD partitioning rule).
    loss_impl: str = "auto"

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 0.001
    batch_size: int = 256
    epochs: int = 200
    patience: int = 10
    seed: int = 42
    weight_decay: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    log_freq: int = 1
    eval_batch_size: int = 256
    # "auto" | "dense" | "streaming": full-catalog eval implementation
    # (streaming = Pallas vocab-sweep kernel, ops/pallas_rank.py)
    eval_impl: str = "auto"
    # device mesh spec: "" = single device; "auto" = all devices on the
    # data axis; "data:N,model:M" = explicit 2-D mesh (model shards the
    # item table rows / logit columns). See core/mesh.py.
    mesh: str = ""
    # epoch-scan unroll factor. Measured on the Beauty parity config
    # (v5e, rbg dropout): 2 -> 245k, 4 -> 254k, 8 -> 260k ex/s, then a
    # cliff (16/32 -> ~214k: the duplicated bodies blow the scheduling
    # window). Unrolling multiplies peak activation memory (XLA
    # schedules the unrolled bodies' residuals concurrently), so 0
    # (default) = auto: start at the measured-fastest 8 and halve while
    # the estimated unrolled residual footprint exceeds ~1 GiB
    # (train/loop.py:resolve_scan_unroll) — long-sequence / many-layer
    # configs downshift themselves instead of faulting the TPU worker.
    # An explicit value (e.g. --scan_unroll 1) is honored verbatim.
    scan_unroll: int = 0
    # rematerialize each encoder block's activations in the backward
    # (jax.checkpoint): trades ~1/3 more FLOPs for O(layers) less
    # residual memory — the standard long-context lever
    remat: bool = False
    # host-fed input pipeline (data/multihost.py): the training set stays
    # on host (each process reads only its slice of every global batch)
    # instead of living in HBM for the whole run; the global batch
    # schedule is bit-equal to the HBM-resident scan's. Required on
    # multi-host slices where no single host holds the full dataset.
    multihost: bool = False
