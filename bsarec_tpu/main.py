"""Flag-compatible CLI entry.

Usage parity with the reference (`src/main.py`, README.md:34-81):

    python -m bsarec_tpu.main --data_name Beauty --model_type BSARec \
        --c 5 --alpha 0.7 --lr 0.0005 --train_name BSARec_Beauty
    python -m bsarec_tpu.main --data_name Beauty --do_eval \
        --load_model BSARec_Beauty

Two-stage parsing like `src/utils.py:51-127`: base flags first, then
model-conditional flags registered from `--model_type`.
"""

from __future__ import annotations

import argparse
import os

import bsarec_tpu.cpu_guard  # noqa: F401  (must precede any backend use)
import numpy as np

from bsarec_tpu.config import ModelConfig, TrainConfig
from bsarec_tpu.data.corpus import load_corpus
from bsarec_tpu.data.pipeline import SeqRecData
from bsarec_tpu.train.trainer import Trainer
from bsarec_tpu.utils.logging import get_local_time, set_logger


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    # basic
    parser.add_argument("--data_dir", default="/root/reference/src/data/", type=str)
    parser.add_argument("--output_dir", default="output/", type=str)
    parser.add_argument("--data_name", default="Beauty", type=str)
    parser.add_argument("--do_eval", action="store_true")
    parser.add_argument("--load_model", default=None, type=str)
    parser.add_argument(
        "--load_torch_model", default=None, type=str,
        help="path to a reference PyTorch .pt state-dict to import",
    )
    parser.add_argument(
        "--export_topk", default=None, type=str,
        help="serving export: write the [num_users, 20] seen-masked "
        "top-k item ids from the final/test model to this .npy path",
    )
    parser.add_argument(
        "--dump_seqout", default=None, type=str,
        help="write reference-layout per-layer sequence-output dumps "
        "(<dir>/<data>_<model>/{L}layer_{i}iter.npy — the figure3.ipynb "
        "input format) from the final/test model to this directory",
    )
    parser.add_argument(
        "--export_serving", default=None, type=str,
        help="AOT serving export: serialize the params-baked, "
        "batch-polymorphic, CPU+TPU top-k scorer (jax.export StableHLO) "
        "to this path; load with bsarec_tpu.serving.load_scorer — no "
        "model code or checkpoint needed at serving time",
    )
    parser.add_argument(
        "--serving_quant", default="none", choices=["none", "int8"],
        help="with --export_serving: quantize the catalog matmul to "
        "symmetric per-row int8 (int8 MXU path, 2x bf16 peak on v5e)",
    )
    parser.add_argument(
        "--serving_impl", default="bitmask",
        choices=["bitmask", "dense", "filtered", "chunked"],
        help="with --export_serving: masking/streaming layout; all "
        "return identical rankings. 'bitmask' (default) fuses the seen "
        "mask as a u32-bitmask compare — 1.6x dense at 1M items; "
        "'dense' is the classic [b, V] scatter-mask; 'filtered' masks "
        "in top-k space (measured 5x slower: k+S+1 leaves the fast "
        "small-k top_k path); 'chunked' streams the catalog in "
        "--serving_item_chunk blocks — O(b*chunk) peak memory, for "
        "catalogs whose logits slab cannot exist",
    )
    parser.add_argument("--serving_item_chunk", default=65536, type=int)
    parser.add_argument("--train_name", default=get_local_time(), type=str)
    parser.add_argument(
        "--profile", default=None, type=str,
        help="write a jax.profiler trace of the run to this directory",
    )
    parser.add_argument(
        "--resume", action="store_true",
        help="resume an interrupted run from its full-state snapshot",
    )
    parser.add_argument(
        "--mesh", default="", type=str,
        help='device mesh: "" (single), "auto", or "data:N,model:M"',
    )
    parser.add_argument(
        "--prng", default="threefry", choices=("threefry", "rbg"),
        help="JAX PRNG implementation. rbg (hardware RNG) makes dropout "
        "mask generation ~free on TPU: +60%% train throughput on the "
        "Beauty config at identical dropout semantics (different random "
        "stream, same distribution)",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="host-fed input pipeline (training set stays on host; "
        "required when no single host holds the full dataset)",
    )
    parser.add_argument(
        "--eval_impl", default="auto", type=str,
        help='full-catalog eval path: auto | dense | streaming',
    )
    parser.add_argument(
        "--dtype", default="fp32", type=str,
        help="compute dtype policy: fp32 (reference-exact) | bf16 (MXU-rate "
        "matmuls, fp32 LayerNorm/softmax/loss accumulation)",
    )
    # drop-in compatibility no-ops (reference `src/utils.py:58-78`):
    # device pinning is meaningless on TPU, worker counts belong to the
    # removed DataLoader, and num_items/num_users/variance are derived or
    # unused in the reference itself
    parser.add_argument("--num_items", default=10, type=int, help="(compat no-op)")
    parser.add_argument("--num_users", default=10, type=int, help="(compat no-op)")
    parser.add_argument("--no_cuda", action="store_true", help="(compat no-op)")
    parser.add_argument("--num_workers", default=4, type=int, help="(compat no-op)")
    parser.add_argument("--gpu_id", default="0", type=str, help="(compat no-op)")
    parser.add_argument("--variance", default=5, type=float, help="(compat no-op)")
    # train
    parser.add_argument("--lr", default=0.001, type=float)
    parser.add_argument("--batch_size", default=256, type=int)
    parser.add_argument("--epochs", default=200, type=int)
    parser.add_argument("--log_freq", default=1, type=int)
    parser.add_argument("--patience", default=10, type=int)
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--weight_decay", default=0.0, type=float)
    parser.add_argument("--adam_beta1", default=0.9, type=float)
    parser.add_argument("--adam_beta2", default=0.999, type=float)
    # model
    parser.add_argument("--model_type", default="BSARec", type=str)
    parser.add_argument("--max_seq_length", default=50, type=int)
    parser.add_argument("--hidden_size", default=64, type=int)
    parser.add_argument("--num_hidden_layers", default=2, type=int)
    parser.add_argument("--hidden_act", default="gelu", type=str)
    parser.add_argument("--num_attention_heads", default=2, type=int)
    parser.add_argument("--attention_probs_dropout_prob", default=0.5, type=float)
    parser.add_argument("--hidden_dropout_prob", default=0.5, type=float)
    parser.add_argument("--initializer_range", default=0.02, type=float)
    parser.add_argument(
        "--scan_unroll", default=0, type=int,
        help="epoch-scan unroll factor; 0 (default) = auto: 8 (fastest "
        "on the parity config), downshifted when the estimated unrolled "
        "residual footprint brushes the HBM limit. Explicit values are "
        "honored verbatim (--scan_unroll 1 minimizes peak memory) — see "
        "TrainConfig.scan_unroll",
    )
    parser.add_argument(
        "--remat", action="store_true",
        help="rematerialize encoder blocks in the backward "
        "(jax.checkpoint): ~1/3 more FLOPs for O(layers) less residual "
        "memory",
    )

    args, _ = parser.parse_known_args(argv)
    mt = args.model_type.lower()
    if mt == "bsarec":
        parser.add_argument("--c", default=3, type=int)
        parser.add_argument("--alpha", default=0.9, type=float)
    elif mt == "bert4rec":
        parser.add_argument("--mask_ratio", default=0.2, type=float)
    elif mt == "caser":
        parser.add_argument("--nh", default=8, type=int)
        parser.add_argument("--nv", default=4, type=int)
        parser.add_argument("--reg_weight", default=1e-4, type=float)
    elif mt in ("duorec", "fearec"):
        parser.add_argument("--tau", default=1.0, type=float)
        parser.add_argument("--lmd", default=0.1, type=float)
        parser.add_argument("--lmd_sem", default=0.1, type=float)
        parser.add_argument("--ssl", default="us_x", type=str)
        parser.add_argument("--sim", default="dot", type=str)
        if mt == "fearec":
            parser.add_argument("--spatial_ratio", default=0.1, type=float)
            parser.add_argument("--global_ratio", default=0.6, type=float)
            parser.add_argument("--fredom_type", default="us_x", type=str)
            parser.add_argument("--fredom", default="True", type=str)
    elif mt == "gru4rec":
        parser.add_argument("--gru_hidden_size", default=64, type=int)
    return parser.parse_args(argv)


def configs_from_args(args, item_size: int, num_users: int):
    model_fields = {f for f in ModelConfig.__dataclass_fields__}
    overrides = {k: v for k, v in vars(args).items() if k in model_fields}
    if "fredom" in overrides and isinstance(overrides["fredom"], str):
        overrides["fredom"] = overrides["fredom"] == "True"
    dtype_names = {"fp32": "float32", "bf16": "bfloat16",
                   "float32": "float32", "bfloat16": "bfloat16"}
    overrides["compute_dtype"] = dtype_names[getattr(args, "dtype", "fp32")]
    model_cfg = ModelConfig(
        **overrides | {"item_size": item_size, "num_users": num_users}
    )
    train_cfg = TrainConfig(
        lr=args.lr,
        batch_size=args.batch_size,
        epochs=args.epochs,
        patience=args.patience,
        seed=args.seed,
        weight_decay=args.weight_decay,
        adam_beta1=args.adam_beta1,
        adam_beta2=args.adam_beta2,
        log_freq=args.log_freq,
        eval_impl=getattr(args, "eval_impl", "auto"),
        mesh=getattr(args, "mesh", ""),
        multihost=getattr(args, "multihost", False),
        scan_unroll=getattr(args, "scan_unroll", 0),
        remat=getattr(args, "remat", False),
    )
    return model_cfg, train_cfg


def main(argv=None):
    args = parse_args(argv)
    if getattr(args, "prng", "threefry") == "rbg":
        import jax

        jax.config.update("jax_default_prng_impl", "rbg")
    os.makedirs(args.output_dir, exist_ok=True)
    logger = set_logger(os.path.join(args.output_dir, args.train_name + ".log"))

    corpus = load_corpus(os.path.join(args.data_dir, args.data_name + ".txt"))
    data = SeqRecData(corpus, args.max_seq_length)
    model_cfg, train_cfg = configs_from_args(
        args, corpus.item_size, corpus.num_users + 1
    )
    logger.info(str(vars(args)))

    checkpoint_path = os.path.join(args.output_dir, args.train_name + ".ckpt")
    trainer = Trainer(model_cfg, train_cfg, data, logger, checkpoint_path)

    from bsarec_tpu.utils.profiling import trace

    if args.do_eval:
        if args.load_torch_model is not None:
            from bsarec_tpu.train.torch_import import import_torch_checkpoint

            # install_params applies the run's mesh placement — a raw
            # `trainer.params = ...` would leave the item table unsharded
            trainer.install_params(import_torch_checkpoint(
                args.model_type, args.load_torch_model, args.num_hidden_layers,
                max_seq_length=args.max_seq_length,
            ))
            logger.info(f"Imported torch checkpoint {args.load_torch_model} for test!")
        elif args.load_model is None:
            logger.info("No model input!")
            return None
        else:
            trainer.load(os.path.join(args.output_dir, args.load_model + ".ckpt"))
            logger.info(f"Load model from {args.load_model} for test!")
        scores, result_info = trainer.test(0)
    else:
        start_epoch = trainer.resume() if args.resume else 0
        with trace(args.profile):
            scores, result_info = trainer.fit(start_epoch)

    if args.export_topk:
        topk = trainer.export_topk("test")
        np.save(args.export_topk, topk)
        logger.info(f"exported top-{topk.shape[1]} item ids for "
                    f"{topk.shape[0]} users to {args.export_topk}")

    if args.dump_seqout:
        tag = f"{args.data_name}_{args.model_type}"
        n = trainer.dump_sequence_outputs(args.dump_seqout, tag)
        logger.info(f"dumped {n} per-layer sequence-output batches to "
                    f"{os.path.join(args.dump_seqout, tag)}")

    if args.export_serving:
        from bsarec_tpu.serving import export_scorer

        meta = export_scorer(
            trainer.model, trainer.params, model_cfg.item_size,
            args.max_seq_length, data.test.seen_items.shape[1],
            args.export_serving, dtype=model_cfg.compute_dtype,
            quant=None if args.serving_quant == "none" else args.serving_quant,
            impl=args.serving_impl, item_chunk=args.serving_item_chunk,
        )
        logger.info(f"exported serving scorer: {meta}")

    logger.info(args.train_name)
    logger.info(result_info)
    return scores


if __name__ == "__main__":
    main()
