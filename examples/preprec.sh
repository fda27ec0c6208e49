# PREPRec reproduce commands — a drop-in mirror of the reference's
# `repo-b/sample.sh` (flag-compatible CLI; see the per-flag audit in
# ARCHITECTURE.md). Data: `<data_dir>/<dataset>_intwtime.csv` plus the
# popularity tables from `bsarec_tpu.preprec.preprocess`. Run from the
# repo root. For a self-contained end-to-end demo on synthetic data
# (preprocess -> train -> zero-shot -> few-shot -> mostpop), run:
#     python benchmarks/preprec_demo.py

# --- train on each domain ---
python -m bsarec_tpu.preprec.main --dataset douban/douban_music --train_dir train_music \
    --time_embed --monthpop wtembed --weekpop week_embed2
python -m bsarec_tpu.preprec.main --dataset douban/douban_movie --train_dir train_movie \
    --time_embed --monthpop wtembed --weekpop week_embed2

# --- evaluate a trained model (week-adjusted eval popularity) ---
python -m bsarec_tpu.preprec.main --dataset douban/douban_music --train_dir test_music \
    --state_dict_path res/douban/douban_music/train/best.ckpt \
    --time_embed --monthpop wtembed --weekpop week_embed2 \
    --use_week_eval --week_eval_pop week_wt_embed_adj --inference_only

# --- zero-shot transfer: popularity encodings carry over, no item embeddings ---
python -m bsarec_tpu.preprec.main --dataset douban/douban_music --train_dir movie_zs_music \
    --state_dict_path res/douban/douban_movie/train/best.ckpt \
    --time_embed --monthpop wtembed --weekpop week_embed2 \
    --use_week_eval --week_eval_pop week_wt_embed_adj --transfer --inference_only

# --- few-shot finetune on a user subset ---
python -m bsarec_tpu.preprec.main --dataset douban/douban_music --train_dir movie_fs_music \
    --state_dict_path res/douban/douban_movie/train/best.ckpt \
    --time_embed --monthpop wtembed --weekpop week_embed2 \
    --use_week_eval --week_eval_pop week_wt_embed_adj \
    --fs_transfer --fs_num_epochs 5 --fs_prop 0.5
