"""Head-to-head: the MOUNTED reference PREPRec program vs this framework,
same machine, same synthetic corpus, same flags (VERDICT r3 item 3a).

The mount ships no PREPRec datasets, so prior quality evidence compared
against module-level parity tests only. This driver closes that gap by
actually EXECUTING `/root/reference/repo-b/main.py` (torch CPU):

  1. builds the two synthetic popularity-dynamics domains with OUR
     offline pipeline (`preprec/preprocess.py` emits the reference's
     exact file formats: _intwtime.csv, _wtembed.txt, _week_embed2.txt,
     _userneg.pickle, _rawpop.txt — `repo-b/data.py:27`,
     `repo-b/model_utils.py:308-309`),
  2. runs the reference CLI on them: train NewRec on A, zero-shot
     transfer A->B (`--transfer --state_dict_path`), mostpop on B
     (`repo-b/main.py`, eval cadence `repo-b/train_test.py:240-277`),
  3. runs OUR CLI (`bsarec_tpu.preprec.main`) with the identical flag
     vector on the identical files,
  4. writes the NDCG@10/HR@10 table to results/r4_runs/headtohead_preprec.md.

Usage: python benchmarks/headtohead_preprec.py [--workdir DIR --epochs N]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bsarec_tpu.cpu_guard  # noqa: F401  (must precede any backend use)

REF = "/root/reference/repo-b"

COMMON = [
    "--maxlen", "12", "--hidden_units", "16", "--num_blocks", "1",
    "--num_heads", "1", "--dropout_rate", "0.1",
    "--base_dim1", "11", "--input_units1", "33",
    "--base_dim2", "6", "--input_units2", "6",
    "--batch_size", "64", "--eval_method", "1",
]

# mostpop prints to stdout "(NDCG@10: 0.1234, HR@10: 0.5678)"; trained
# runs write "NDCG@10: x, HR@10: y" to res/<ds>/<dir>/log.txt after
# "Test results:" (`repo-b/train_test.py:296-300`, `repo-b/main.py:90-92`)
_REF_METRIC = re.compile(r"NDCG@(\d+): ([0-9.]+), HR@\1: ([0-9.]+)")

# Minimal launcher shim, run via `python -c`: repo-b/main.py:164 reads
# `args.fs_emb_2`, which repo-b/parse.py never defines, so the mounted
# reference's own --state_dict_path path raises AttributeError inside a
# bare try/except and dies with "loading state dict failed". Patching
# the parsed namespace (fs_emb_2=False, the only value parse.py could
# have defaulted) is the smallest intervention that lets the shipped
# transfer path execute; the mount itself is untouched.
_LAUNCHER = """
import os, runpy, sys
sys.path.insert(0, {ref!r})
import parse as _parse
_orig = _parse.parse
def _patched():
    args = _orig()
    if not hasattr(args, "fs_emb_2"):
        args.fs_emb_2 = False
    return args
_parse.parse = _patched
sys.argv = ["main.py"] + sys.argv[1:]
runpy.run_path(os.path.join({ref!r}, "main.py"), run_name="__main__")
"""


def run_reference(workdir: str, argv: list[str], logdir: str | None = None) -> dict:
    """Execute the mounted repo-b CLI in `workdir` (data/ + res/ live
    there; the program reads ./data/<dataset>_* relative to cwd)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REF + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _LAUNCHER.format(ref=REF),
         "--device", "cpu", *argv],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=3600,
    )
    sys.stderr.write(proc.stderr[-2000:])
    print(proc.stdout[-2000:])
    if proc.returncode != 0:
        raise RuntimeError(f"reference run failed rc={proc.returncode}")
    text = proc.stdout
    if logdir:  # trained runs log test metrics to file, not stdout
        with open(os.path.join(workdir, logdir, "log.txt")) as fh:
            text = fh.read()
        text = text.split("Test results:")[-1]
    out = {}
    for k, ndcg, hr in _REF_METRIC.findall(text):
        out[f"NDCG@{k}"], out[f"HR@{k}"] = float(ndcg), float(hr)
    return out


# The mounted reference's mostpop CLI leg cannot execute AT ALL: in the
# per-user eval loop `loc = int(userpop[u] // args.quality_size)`
# (repo-b/utils.py:433) reads `userpop`, a local only assigned under
# `--eval_quality` (utils.py:330) — UnboundLocalError without the flag;
# WITH the flag the final normalization reads `locs` (utils.py:451),
# a local only assigned in the newrec-family branch (utils.py:360) —
# UnboundLocalError again. (Both are dead-assignment oversights: `loc`
# itself is unused when eval_quality is off.) Python resolves both names
# as function locals at compile time, so no injection can unbreak the
# shipped main.py path. The head-to-head therefore executes the
# reference's actual SCORING code — `data.data_partition` +
# `utils.predict_mostpop` (utils.py:858-883), unmodified, in-process
# from the mount — and applies the reference's own eval_method-1
# aggregation (utils.py:436-447,455: NDCG += 1/log2(rank+2), HR += 1
# for rank<k, /= valid_user, round 3) outside the broken loop.
_MOSTPOP_DRIVER = """
import pickle, sys
import numpy as np
sys.path.insert(0, {ref!r})
from argparse import Namespace
from data import data_partition
from utils import predict_mostpop

maxlen, topk, seed = int(sys.argv[1]), 10, 2023  # parse.py:42 default seed
np.random.seed(seed)  # main.py:39 (tie-break stream in predict_mostpop)
train, valid, test, usernum, itemnum = data_partition("synthB", maxlen)
misc = np.loadtxt("./datasynthB_rawpop.txt")  # utils.py:352-353 quirk path
with open("./data/synthB_userneg.pickle", "rb") as fh:
    negs = pickle.load(fh)
args = Namespace(eval_method=1, topk=[topk])
ndcg = hr = n = 0
for u in range(1, usernum + 1):
    rank = predict_mostpop(
        None,
        [test[0][u], test[1][u], test[2][u]],
        [train[0][u], train[1][u], train[2][u]],
        [valid[0][u], valid[1][u], valid[2][u]],
        [test[0][u], test[1][u], test[2][u]],
        itemnum, args, "test", negs[u], misc)
    n += 1
    if rank < topk:
        ndcg += 1.0 / np.log2(rank + 2)
        hr += 1
print(f"(NDCG@{{topk}}: {{round(ndcg / n, 3)}}, HR@{{topk}}: {{round(hr / n, 3)}})")
"""


def run_reference_mostpop(workdir: str, maxlen: int = 12) -> dict:
    """Reference mostpop via its own predict_mostpop (see note above)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REF + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _MOSTPOP_DRIVER.format(ref=REF), str(maxlen)],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=1800,
    )
    sys.stderr.write(proc.stderr[-2000:])
    print(proc.stdout[-2000:])
    if proc.returncode != 0:
        raise RuntimeError(f"reference mostpop failed rc={proc.returncode}")
    out = {}
    for k, ndcg, hr in _REF_METRIC.findall(proc.stdout):
        out[f"NDCG@{k}"], out[f"HR@{k}"] = float(ndcg), float(hr)
    return out


def run_ours(workdir: str, argv: list[str]) -> dict:
    """Drive bsarec_tpu.preprec.main in-process; returns HR/NDCG@10."""
    from bsarec_tpu.preprec.main import main as cli

    cwd = os.getcwd()
    os.chdir(workdir)  # both CLIs write res/<dataset>/<train_dir>/ under cwd
    try:
        metrics = cli(argv)
    finally:
        os.chdir(cwd)
    ndcg10, hr10 = metrics[0]
    return {"NDCG@10": float(ndcg10), "HR@10": float(hr10)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/headtohead_preprec")
    parser.add_argument("--epochs", type=int, default=12)
    parser.add_argument(
        "--out", default=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "results/r4_runs/headtohead_preprec.md"))
    args = parser.parse_args()
    args.workdir = os.path.abspath(args.workdir)
    datadir = os.path.join(args.workdir, "data")
    os.makedirs(datadir, exist_ok=True)

    from benchmarks.preprec_demo import build_domain

    for name, seed in (("synthA", 11), ("synthB", 22)):
        stats = build_domain(datadir, name, seed)
        print(f"# {name}: {stats}", flush=True)

    sched = ["--num_epochs", str(args.epochs), "--epoch_test", "3",
             "--stop_early", "4"]
    rows = {}

    # --- reference program (torch CPU) ---
    ref_train = run_reference(args.workdir, [
        "--dataset", "synthA", "--model", "newrec", "--train_dir", "ref_demo",
        *sched, *COMMON], logdir="res/synthA/ref_demo")
    best = os.path.join(args.workdir, "res", "synthA", "ref_demo", "best.pth")
    ref_zs = run_reference(args.workdir, [
        "--dataset", "synthB", "--model", "newrec", "--train_dir", "ref_zs",
        "--transfer", "--state_dict_path", best, *COMMON],
        logdir="res/synthB/ref_zs") if os.path.exists(best) else {}
    # repo-b/utils.py:353 loads f"./data{dataset}_rawpop.txt" — no slash,
    # unlike every data.py path (its authors' dataset names carry a
    # directory prefix); give the mostpop leg that quirk path as a
    # symlink to the real file so the mounted code runs unmodified
    quirk = os.path.join(args.workdir, "datasynthB_rawpop.txt")
    if not os.path.lexists(quirk):
        os.symlink(os.path.join("data", "synthB_rawpop.txt"), quirk)
    ref_pop = run_reference_mostpop(args.workdir)
    rows["reference"] = {"train_A": ref_train, "zero_shot_A_to_B": ref_zs,
                         "mostpop_B": ref_pop}

    # --- this framework, identical flags + files ---
    ours_train = run_ours(args.workdir, [
        "--dataset", "synthA", "--data_dir", datadir, "--model", "newrec",
        "--train_dir", "ours_demo", *sched, *COMMON])
    ours_best = os.path.join(args.workdir, "res", "synthA", "ours_demo", "best.ckpt")
    ours_zs = run_ours(args.workdir, [
        "--dataset", "synthB", "--data_dir", datadir, "--model", "newrec",
        "--train_dir", "ours_zs", "--transfer", "--state_dict_path", ours_best,
        *COMMON])
    ours_pop = run_ours(args.workdir, [
        "--dataset", "synthB", "--data_dir", datadir, "--model", "mostpop",
        *COMMON])
    rows["ours"] = {"train_A": ours_train, "zero_shot_A_to_B": ours_zs,
                    "mostpop_B": ours_pop}

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        fh.write(
            "# PREPRec head-to-head: mounted reference (torch CPU) vs "
            "bsarec_tpu — same machine, corpus, flags\n\n"
            f"Synthetic 2-domain popularity-dynamics corpus "
            f"(`benchmarks/preprec_demo.py:synth_domain`), {args.epochs} "
            "epochs, eval_method 1 (50 sampled negatives). Reference "
            "executed from the read-only mount (`repo-b/main.py`); both "
            "programs read the SAME preprocessed files. The reference's "
            "mostpop CLI leg is unexecutable as shipped (UnboundLocalError "
            "either way: `userpop` utils.py:433 without --eval_quality, "
            "`locs` utils.py:451 with it), so that row executes the "
            "reference's own `predict_mostpop` (utils.py:858-883) "
            "in-process with its eval_method-1 aggregation applied "
            "outside the broken loop.\n\n"
            "| stage | reference NDCG@10 | ours NDCG@10 | reference HR@10 | ours HR@10 |\n"
            "|---|---|---|---|---|\n")
        for stage in ("train_A", "zero_shot_A_to_B", "mostpop_B"):
            r, o = rows["reference"][stage], rows["ours"][stage]
            fh.write(
                f"| {stage} | {r.get('NDCG@10', float('nan')):.4f} | "
                f"{o['NDCG@10']:.4f} | {r.get('HR@10', float('nan')):.4f} | "
                f"{o['HR@10']:.4f} |\n")
        fh.write("\nRaw: " + json.dumps(rows) + "\n")
    print(json.dumps({"metric": "headtohead_preprec", **rows}))


if __name__ == "__main__":
    main()
