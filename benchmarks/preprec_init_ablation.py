"""Attribute the PREPRec trained-leg head-to-head gap (VERDICT r4
item 3): is the 2.5x NDCG@10 difference the INIT SCHEME?

Finding (round 5): `repo-b/main.py:126-135` re-initializes every
parameter with `torch.nn.init.xavier_normal_` inside a bare
try/except — xavier raises on <2-D tensors, so the reference's
EFFECTIVE init is xavier-normal kernels/embeddings + default biases.
Until round 5 this framework used plain torch defaults
(kaiming-uniform kernels, N(0,1) embeddings) on the belief that
"repo-b applies no custom init" — a mis-read of that loop.

This driver runs OUR trainer on the identical synthetic corpus and
schedule as the head-to-head under both schemes
(BSAREC_PREPREC_INIT=torch|xavier), multiple seeds, and tables the
final test metrics + validation trajectories. If the xavier runs land
in the reference's band while the torch-default runs reproduce the r4
blowout, the gap has one named, demonstrated cause.

Usage: python benchmarks/preprec_init_ablation.py [--epochs 100 --seeds 2023,7,8]
Writes results/r5_runs/preprec_init_ablation.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bsarec_tpu.cpu_guard  # noqa: F401

COMMON = [
    "--maxlen", "12", "--hidden_units", "16", "--num_blocks", "1",
    "--num_heads", "1", "--dropout_rate", "0.1",
    "--base_dim1", "11", "--input_units1", "33",
    "--base_dim2", "6", "--input_units2", "6",
    "--batch_size", "64", "--eval_method", "1",
]

_TEST = re.compile(r"Test NDCG@10: ([0-9.]+), HR@10: ([0-9.]+)")
_VALID = re.compile(r"epoch (\d+) valid: NDCG@10 ([0-9.]+), HR@10 ([0-9.]+)")


def run_ours(workdir: str, scheme: str, seed: int, epochs: int) -> dict:
    env = dict(os.environ)
    env["BSAREC_PREPREC_INIT"] = scheme
    env["JAX_PLATFORM_NAME"] = env.get("JAX_PLATFORM_NAME", "cpu")
    code = (
        "import bsarec_tpu.cpu_guard\n"
        "from bsarec_tpu.preprec.main import main\n"
        f"main({COMMON + ['--dataset', 'synthA', '--data_dir', 'data', '--model', 'newrec']!r}"
        f" + ['--train_dir', 'abl_{scheme}_{seed}', '--seed', '{seed}',"
        f" '--num_epochs', '{epochs}', '--epoch_test', '3', '--stop_early', '4'])\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=workdir, env=env,
        capture_output=True, text=True, timeout=3600,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-3000:])
        raise RuntimeError(f"ours/{scheme}/s{seed} failed rc={proc.returncode}")
    text = proc.stderr + proc.stdout  # logging goes to stderr by default
    m = _TEST.search(text)
    valid = [(int(e), float(n), float(h)) for e, n, h in _VALID.findall(text)]
    return {
        "test_ndcg10": float(m.group(1)) if m else None,
        "test_hr10": float(m.group(2)) if m else None,
        "valid": valid,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/preprec_init_ablation")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--seeds", default="2023,7,8")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results/r5_runs/preprec_init_ablation.md"))
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    args.workdir = os.path.abspath(args.workdir)
    datadir = os.path.join(args.workdir, "data")
    os.makedirs(datadir, exist_ok=True)

    from benchmarks.preprec_demo import build_domain

    stats = build_domain(datadir, "synthA", 11)  # head-to-head corpus
    print(f"# synthA: {stats}", flush=True)

    rows = {}
    for scheme in ("torch", "xavier"):
        rows[scheme] = {}
        for seed in seeds:
            r = run_ours(args.workdir, scheme, seed, args.epochs)
            rows[scheme][seed] = r
            print(f"# {scheme} seed {seed}: test NDCG@10 {r['test_ndcg10']} "
                  f"HR@10 {r['test_hr10']} ({len(r['valid'])} evals)", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        fh.write(
            "# PREPRec init-scheme ablation (VERDICT r4 item 3)\n\n"
            "Same corpus/flags/schedule as the head-to-head "
            "(`benchmarks/headtohead_preprec.py`), OUR trainer only, two "
            "init schemes: `xavier` = the reference's effective init "
            "(xavier_normal on all >=2-D params via the try/except loop, "
            "`repo-b/main.py:126-135`); `torch` = plain torch module "
            "defaults (the mis-read this framework used through round 4).\n\n"
            "| scheme | seed | test NDCG@10 | test HR@10 | evals to stop |\n"
            "|---|---|---|---|---|\n")
        for scheme in ("torch", "xavier"):
            for seed in seeds:
                r = rows[scheme][seed]
                fh.write(f"| {scheme} | {seed} | {r['test_ndcg10']} | "
                         f"{r['test_hr10']} | {len(r['valid'])} |\n")
        fh.write("\n## Validation NDCG@10 trajectories\n\n")
        for scheme in ("torch", "xavier"):
            for seed in seeds:
                tr = ", ".join(f"e{e}:{n}" for e, n, _ in rows[scheme][seed]["valid"])
                fh.write(f"- {scheme}/s{seed}: {tr}\n")
        fh.write("\nReference comparison: "
                 "`results/r5_runs/headtohead_preprec_plateau.md` "
                 "(the mounted torch program on the same corpus).\n")
    print(json.dumps({"metric": "preprec_init_ablation", **{
        s: {str(k): {kk: vv for kk, vv in v.items() if kk != "valid"}
            for k, v in rows[s].items()} for s in rows}}))


if __name__ == "__main__":
    main()
