"""PREPRec end-to-end demo: offline preprocessing -> train -> zero-shot
transfer -> few-shot, all through the real CLIs, on synthetic data.

The mount ships no PREPRec datasets (no douban/yelp CSVs under
`/root/reference/repo-b/`), so the framework's PREPRec evidence is
test-level. This demo generates two domains from a shared
popularity-dynamics process (items rise and fall in popularity; users
pick what is currently popular), runs the full offline pipeline
(`preprec/preprocess.py`: percentile tables, eval negatives, week
adjustment) for both, then drives `bsarec_tpu.preprec.main`:

  1. train NewRec (PREPRec) on domain A,
  2. zero-shot transfer eval A -> B (`--transfer --state_dict_path`,
     popularity tables swapped to B's, weights untouched),
  3. few-shot fine-tune on B (`--fs_transfer`),
  4. `--model mostpop` popularity baseline on B for context.

Zero-shot works because NewRec never embeds item ids — only their
popularity-percentile trajectories, which this generative process makes
informative in both domains (`repo-b/README.md`, SURVEY.md §3.5).

Usage: python benchmarks/preprec_demo.py [--workdir DIR]
Prints one JSON line with HR@10/NDCG@10 for each stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bsarec_tpu.cpu_guard  # noqa: F401  (must precede any backend use)
import numpy as np

YEAR = 3600 * 24 * 365
BASE_T = 1_500_000_000


def synth_domain(seed: int, n_users=250, n_items=60, events_lo=12, events_hi=26):
    """Popularity-lifecycle process: item i's attractiveness is a
    Gaussian bump in time (era center c_i, width w_i) times a lognormal
    base; each user's events sample items proportional to current
    attractiveness. Different seeds give disjoint item identities but
    the same dynamics — the PREPRec transfer premise."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0, YEAR, n_items)
    widths = rng.uniform(YEAR / 24, YEAR / 6, n_items)
    base = rng.lognormal(0.0, 1.0, n_items)
    users, items, times = [], [], []
    for u in range(n_users):
        k = rng.integers(events_lo, events_hi)
        ts = np.sort(rng.uniform(0, YEAR, k))
        attr = base * np.exp(-((ts[:, None] - centers) ** 2) / (2 * widths**2))
        attr = attr + 1e-9
        p = attr / attr.sum(axis=1, keepdims=True)
        choice = np.array([rng.choice(n_items, p=p[i]) for i in range(k)])
        users.extend([u] * k)
        items.extend(choice.tolist())
        times.extend((BASE_T + ts).astype(np.int64).tolist())
    return np.array(items), np.array(users), np.array(times, np.int64)


def build_domain(workdir: str, name: str, seed: int):
    from bsarec_tpu.preprec.preprocess import (
        eval_negatives,
        preprocess,
        week_adjustment,
    )

    prefix = os.path.join(workdir, name)
    items, users, times = synth_domain(seed)
    stats = preprocess(items, users, times, prefix, t1_cutoff=30.0, t2_cutoff=7.0)
    eval_negatives(f"{prefix}_intwtime.csv", f"{prefix}_userneg.pickle", n=50, seed=seed)
    week_adjustment(
        f"{prefix}_intwtime.csv", f"{prefix}_userneg.pickle",
        f"{prefix}_week_curr_raw.txt", f"{prefix}_week_wt_embed_adj.txt",
    )
    return stats


COMMON = [
    "--maxlen", "12", "--hidden_units", "16", "--num_blocks", "1",
    "--num_heads", "1", "--dropout_rate", "0.1",
    "--base_dim1", "11", "--input_units1", "33",
    "--base_dim2", "6", "--input_units2", "6",
    "--batch_size", "64", "--eval_method", "1",
]


def hr_ndcg(metrics):
    """main() returns [(ndcg, hr), ...] ordered by --topk (10, 5, 1)."""
    ndcg10, hr10 = metrics[0]
    return {"HR@10": round(float(hr10), 4), "NDCG@10": round(float(ndcg10), 4)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/preprec_demo")
    parser.add_argument("--epochs", type=int, default=12)
    args = parser.parse_args()
    # resolved before os.chdir below — a relative workdir would
    # otherwise double-join when reused as --data_dir
    args.workdir = os.path.abspath(args.workdir)

    os.makedirs(args.workdir, exist_ok=True)
    for name, seed in (("synthA", 11), ("synthB", 22)):
        stats = build_domain(args.workdir, name, seed)
        print(f"# {name}: {stats}", flush=True)

    # the CLI writes checkpoints under res/<dataset>/<train_dir>/ (cwd)
    os.chdir(args.workdir)
    from bsarec_tpu.preprec.main import main as cli

    out = {}
    out["train_A"] = hr_ndcg(cli([
        "--dataset", "synthA", "--data_dir", args.workdir, "--model", "newrec",
        "--train_dir", "demo", "--num_epochs", str(args.epochs),
        "--epoch_test", "3", "--stop_early", "4", *COMMON,
    ]))
    best = os.path.join(args.workdir, "res", "synthA", "demo", "best.ckpt")
    out["zero_shot_A_to_B"] = hr_ndcg(cli([
        "--dataset", "synthB", "--data_dir", args.workdir, "--model", "newrec",
        "--train_dir", "demo_zs", "--transfer", "--state_dict_path", best,
        *COMMON,
    ]))
    out["few_shot_B"] = hr_ndcg(cli([
        "--dataset", "synthB", "--data_dir", args.workdir, "--model", "newrec",
        "--train_dir", "demo_fs", "--fs_transfer", "--state_dict_path", best,
        "--fs_num_epochs", "4", "--epoch_test", "2", *COMMON,
    ]))
    out["mostpop_B"] = hr_ndcg(cli([
        "--dataset", "synthB", "--data_dir", args.workdir, "--model", "mostpop",
        *COMMON,
    ]))
    print(json.dumps({"metric": "preprec_transfer_demo", **out}))


if __name__ == "__main__":
    main()
