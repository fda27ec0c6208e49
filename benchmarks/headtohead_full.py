"""Full-convergence multi-seed head-to-head: mounted reference BSARec
program vs this framework, run to each program's NATURAL early stop
(VERDICT r4 item 2; closes the truncated-run caveat of
`results/r4_runs/headtohead_src.md`).

Per seed, runs `/root/reference/src/main.py` (torch CPU, `--no_cuda`)
at the published winning config for the dataset with a large --epochs
budget so its own EarlyStopping (patience 10 on NDCG@20,
`src/utils.py:129-176`, `src/main.py:57`) terminates the run, then runs
OUR CLI with the identical config/budget. Tables the final TEST metrics
per seed plus mean +/- std bands for both programs, and each program's
early-stop epoch.

Winning configs (log line 1 of the committed reference logs):
  LastFM: c=3 alpha=0.9 lr=1e-3 heads=1  (`src/output/BSARec_LastFM_best.log:1`)
  Beauty: c=5 alpha=0.7 lr=5e-4 heads=1  (`src/output/BSARec_Beauty_best.log:1`)

Legs are idempotent: a leg whose log already contains a test block is
skipped, so the driver can be re-run to pick up where a timeout left
off or to just regenerate the report (--report-only).

Usage:
  python benchmarks/headtohead_full.py --dataset LastFM --seeds 42,1,2
  python benchmarks/headtohead_full.py --dataset Beauty --seeds 42 --timeout 28800
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bsarec_tpu.cpu_guard  # noqa: F401  (must precede any backend use)

from benchmarks.headtohead_src import parse_log  # same log grammar

REF = "/root/reference/src"
DATA = "/root/reference/src/data/"

CONFIGS = {
    "LastFM": ["--c", "3", "--alpha", "0.9", "--lr", "0.001"],
    "Beauty": ["--c", "5", "--alpha", "0.7", "--lr", "0.0005"],
}

METRICS = ("HR@5", "NDCG@5", "HR@10", "NDCG@10", "HR@20", "NDCG@20")


def leg_done(path: str) -> bool:
    if not os.path.exists(path):
        return False
    try:
        return parse_log(path)[1] is not None
    except Exception:
        return False


def best_valid_epoch(path: str) -> int:
    """Epoch of the best NDCG@20 validation score (the quantity the
    reference's EarlyStopping tracks, `src/main.py:57`)."""
    valid, _ = parse_log(path)
    if not valid:
        return -1
    return max(valid, key=lambda d: d["NDCG@20"])["epoch"]


def run_ref(workdir: str, dataset: str, seed: int, epochs: int, timeout: int) -> None:
    name = f"ref_{dataset.lower()}_s{seed}"
    if leg_done(os.path.join(workdir, name + ".log")):
        print(f"# {name}: already complete, skipping", flush=True)
        return
    env = dict(os.environ)
    env["PYTHONPATH"] = REF + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REF, "main.py"),
         "--data_name", dataset, "--model_type", "BSARec",
         "--num_attention_heads", "1", *CONFIGS[dataset],
         "--seed", str(seed), "--no_cuda", "--epochs", str(epochs),
         "--data_dir", DATA, "--output_dir", workdir + "/",
         "--train_name", name],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=timeout)
    sys.stderr.write(proc.stderr[-2000:])
    print(f"# {name}: rc={proc.returncode} in {time.time() - t0:.0f}s", flush=True)
    if proc.returncode != 0:
        raise RuntimeError(f"{name} failed rc={proc.returncode}")


def run_ours(workdir: str, dataset: str, seed: int, epochs: int) -> None:
    name = f"ours_{dataset.lower()}_s{seed}"
    if leg_done(os.path.join(workdir, name + ".log")):
        print(f"# {name}: already complete, skipping", flush=True)
        return
    from bsarec_tpu.main import main as cli

    t0 = time.time()
    cli(["--data_name", dataset, "--model_type", "BSARec",
         "--num_attention_heads", "1", *CONFIGS[dataset],
         "--seed", str(seed), "--epochs", str(epochs), "--scan_unroll", "1",
         "--data_dir", DATA, "--output_dir", workdir + "/",
         "--train_name", name])
    print(f"# {name}: done in {time.time() - t0:.0f}s", flush=True)


def band(vals: list[float]) -> str:
    if not vals:
        return "—"
    if len(vals) == 1:
        return f"{vals[0]:.4f}"
    return f"{statistics.mean(vals):.4f} ± {statistics.stdev(vals):.4f}"


def write_report(workdir: str, dataset: str, seeds: list[int], out: str) -> dict:
    rows, bands = {}, {"reference": {}, "ours": {}}
    for prog in ("ref", "ours"):
        for seed in seeds:
            path = os.path.join(workdir, f"{prog}_{dataset.lower()}_s{seed}.log")
            if leg_done(path):
                rows[(prog, seed)] = (parse_log(path)[1], best_valid_epoch(path))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "a" if False else "w") as fh:
        fh.write(
            f"# {dataset} full-convergence head-to-head: mounted reference "
            "(`src/main.py`, torch CPU) vs bsarec_tpu (CPU) — natural early "
            "stop, multi-seed\n\n"
            "Both programs run the published winning config "
            f"({' '.join(CONFIGS[dataset])}, heads=1) with a large epoch "
            "budget; each stops via its own patience-10 early stopping on "
            "validation NDCG@20. RNG streams necessarily differ (torch CPU "
            "generator vs JAX threefry), so parity means overlapping "
            "final-test bands, not bit-equality.\n\n"
            "## Final TEST metrics per seed\n\n"
            "| program | seed | stop epoch | " + " | ".join(METRICS) + " |\n"
            "|---|---|---|" + "---|" * len(METRICS) + "\n")
        for prog, label in (("ref", "reference"), ("ours", "ours")):
            for seed in seeds:
                if (prog, seed) not in rows:
                    fh.write(f"| {label} | {seed} | (pending) |" + " — |" * len(METRICS) + "\n")
                    continue
                test, stop = rows[(prog, seed)]
                fh.write(f"| {label} | {seed} | {stop} | " +
                         " | ".join(f"{test[m]:.4f}" for m in METRICS) + " |\n")
        fh.write("\n## Bands (mean ± std over seeds)\n\n| metric | reference | ours |\n|---|---|---|\n")
        for m in METRICS:
            rv = [rows[("ref", s)][0][m] for s in seeds if ("ref", s) in rows]
            ov = [rows[("ours", s)][0][m] for s in seeds if ("ours", s) in rows]
            bands["reference"][m], bands["ours"][m] = rv, ov
            fh.write(f"| {m} | {band(rv)} | {band(ov)} |\n")
        srcs = {"LastFM": "src/output/BSARec_LastFM_best.log:237",
                "Beauty": "src/output/BSARec_Beauty_best.log:258"}
        pub = {"LastFM": "HR@5 .0523 NDCG@5 .0344 HR@10 .0807 NDCG@10 .0435 HR@20 .1174 NDCG@20 .0526",
               "Beauty": "HR@5 .0736 NDCG@5 .0523 HR@10 .1008 NDCG@10 .0611 HR@20 .1373 NDCG@20 .0703"}
        fh.write(
            f"\nAuthors' GPU log (seed 42, `{srcs[dataset]}`): {pub[dataset]}.\n"
            f"\nRaw logs: {workdir}/{{ref,ours}}_{dataset.lower()}_s<seed>.log\n")
    return bands


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="LastFM", choices=list(CONFIGS))
    p.add_argument("--seeds", default="42,1,2")
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--timeout", type=int, default=10800, help="per reference leg")
    p.add_argument("--workdir", default="/tmp/headtohead_full")
    p.add_argument("--report-only", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"results/r5_runs/headtohead_full_{args.dataset.lower()}.md")
    os.makedirs(args.workdir, exist_ok=True)

    if not args.report_only:
        for seed in seeds:
            run_ref(args.workdir, args.dataset, seed, args.epochs, args.timeout)
            write_report(args.workdir, args.dataset, seeds, out)  # partial progress
            run_ours(args.workdir, args.dataset, seed, args.epochs)
            write_report(args.workdir, args.dataset, seeds, out)

    bands = write_report(args.workdir, args.dataset, seeds, out)
    print(json.dumps({"metric": f"headtohead_full_{args.dataset.lower()}", **bands}))


if __name__ == "__main__":
    main()
