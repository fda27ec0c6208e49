# BSARec-zoo reproduce commands (mirrors the reference README's recipes,
# `/root/reference/README.md:34-81`, with this repo's measured winning
# configs — results/quality_zoo_r2.md). Run from the repo root.

# --- train BSARec: the reference's shipped winning configs ---
python -m bsarec_tpu.main --data_name Beauty --lr 0.0005 --alpha 0.7 --c 5 \
    --num_attention_heads 1 --train_name BSARec_Beauty
python -m bsarec_tpu.main --data_name LastFM --lr 0.001 --alpha 0.9 --c 3 \
    --num_attention_heads 1 --train_name BSARec_LastFM

# --- train BSARec: configs swept here (best validation NDCG@20 on the
#     paper's grid; the mount ships no winning configs for these) ---
python -m bsarec_tpu.main --data_name Toys_and_Games --lr 0.0005 --alpha 0.7 --c 5 \
    --num_attention_heads 1 --train_name BSARec_Toys
python -m bsarec_tpu.main --data_name Sports_and_Outdoors --lr 0.001 --alpha 0.9 --c 3 \
    --num_attention_heads 1 --train_name BSARec_Sports
python -m bsarec_tpu.main --data_name Yelp --lr 0.001 --alpha 0.9 --c 3 \
    --num_attention_heads 1 --train_name BSARec_Yelp

# --- evaluate a trained checkpoint (reproduces its test metrics exactly) ---
python -m bsarec_tpu.main --data_name Beauty --alpha 0.7 --c 5 \
    --num_attention_heads 1 --load_model BSARec_Beauty --do_eval

# --- evaluate the reference's shipped PyTorch checkpoint directly ---
python -m bsarec_tpu.main --data_name Beauty --alpha 0.7 --c 5 --num_attention_heads 1 \
    --load_torch_model /root/reference/src/output/BSARec_Beauty_best.pt --do_eval

# --- baselines: swap model_type (tuned rows from results/quality_zoo_r2.md) ---
python -m bsarec_tpu.main --model_type SASRec   --data_name Beauty --lr 0.0005 \
    --num_attention_heads 1 --train_name SASRec_Beauty
python -m bsarec_tpu.main --model_type FMLPRec  --data_name Beauty --lr 0.001 \
    --hidden_dropout_prob 0.25 --train_name FMLPRec_Beauty
python -m bsarec_tpu.main --model_type BERT4Rec --data_name Beauty --train_name BERT4Rec_Beauty
python -m bsarec_tpu.main --model_type DuoRec   --data_name Beauty --train_name DuoRec_Beauty
python -m bsarec_tpu.main --model_type FEARec   --data_name Beauty --train_name FEARec_Beauty
python -m bsarec_tpu.main --model_type Caser    --data_name Beauty --train_name Caser_Beauty
python -m bsarec_tpu.main --model_type GRU4Rec  --data_name Beauty --train_name GRU4Rec_Beauty

# --- TPU-specific levers (all optional; docs/performance.md) ---
# hardware-RNG dropout (~1.6x train throughput), bf16 matmuls, vocab-sharded mesh
python -m bsarec_tpu.main --data_name Beauty --lr 0.0005 --alpha 0.7 --c 5 \
    --num_attention_heads 1 --prng rbg --dtype bf16 --train_name BSARec_Beauty_fast
# python -m bsarec_tpu.main ... --mesh data:4,model:2        # multi-chip
# python -m bsarec_tpu.main ... --multihost                  # host-fed pipeline
# python -m bsarec_tpu.main ... --resume                     # crash recovery

# --- serving exports ---
python -m bsarec_tpu.main --data_name Beauty --alpha 0.7 --c 5 --num_attention_heads 1 \
    --load_model BSARec_Beauty --do_eval --export_topk recs.npy
python -m bsarec_tpu.main --data_name Beauty --alpha 0.7 --c 5 --num_attention_heads 1 \
    --load_model BSARec_Beauty --do_eval \
    --export_serving scorer.jaxexp --serving_quant int8
python -m bsarec_tpu.serve scorer.jaxexp --port 8123
