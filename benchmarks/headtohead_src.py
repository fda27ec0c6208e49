"""Head-to-head: the MOUNTED reference BSARec program vs this framework,
same machine, same dataset, same config (VERDICT r3 item 3b).

Prior src-side quality anchors were the authors' 2023 GPU logs plus
module-level parity tests; this driver EXECUTES
`/root/reference/src/main.py` here (torch CPU, `--no_cuda`) on LastFM
(the smallest mounted dataset) at the published winning config
(c=3, alpha=0.9, lr=1e-3, heads=1, seed 42 —
`src/output/BSARec_LastFM_best.log:1`) for N epochs, runs OUR CLI with
the identical config on CPU, and tables the per-epoch validation
trajectory (both programs log the same
`{'Epoch': e, 'HR@5': ...}` dicts) plus the final test metrics.

Usage: python benchmarks/headtohead_src.py [--epochs 15 --workdir DIR]
Writes results/r4_runs/headtohead_src.md.
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

REF = "/root/reference/src"
DATA = "/root/reference/src/data/"

_EPOCH = re.compile(
    r"\{'Epoch': (\d+), 'HR@5': '([\d.]+)', 'NDCG@5': '([\d.]+)', "
    r"'HR@10': '([\d.]+)', 'NDCG@10': '([\d.]+)', 'HR@20': '([\d.]+)', "
    r"'NDCG@20': '([\d.]+)'\}")


def parse_log(path: str) -> tuple[list[dict], dict | None]:
    """(per-epoch valid dicts, final test dict). Both programs print the
    same `{'Epoch': ...}` dicts and a '---Test Score---' separator
    before the test block (`src/main.py:62`, ours mirrors it; the
    reference then repeats the block as result_info — deduped here)."""

    def scan(text):
        out = []
        for m in _EPOCH.finditer(text):
            e, h5, n5, h10, n10, h20, n20 = m.groups()
            out.append({"epoch": int(e), "HR@5": float(h5), "NDCG@5": float(n5),
                        "HR@10": float(h10), "NDCG@10": float(n10),
                        "HR@20": float(h20), "NDCG@20": float(n20)})
        return out

    with open(path) as fh:
        text = fh.read()
    head, _, tail = text.partition("Test Score")
    tests = scan(tail)
    return scan(head), tests[0] if tests else None


CONFIG = ["--data_name", "LastFM", "--model_type", "BSARec", "--c", "3",
          "--alpha", "0.9", "--lr", "0.001", "--num_attention_heads", "1",
          "--seed", "42"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=15)
    parser.add_argument("--workdir", default="/tmp/headtohead_src")
    parser.add_argument(
        "--skip-ref", action="store_true",
        help="reuse an existing reference log (idempotent re-runs)")
    parser.add_argument(
        "--out", default=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "results/r4_runs/headtohead_src.md"))
    args = parser.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    ref_log = os.path.join(args.workdir, "ref_lastfm_cpu.log")
    ours_log = os.path.join(args.workdir, "ours_lastfm_cpu.log")

    if not (args.skip_ref and os.path.exists(ref_log)):
        env = dict(os.environ)
        env["PYTHONPATH"] = REF + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, os.path.join(REF, "main.py"), *CONFIG,
             "--no_cuda", "--epochs", str(args.epochs),
             "--data_dir", DATA, "--output_dir", args.workdir + "/",
             "--train_name", "ref_lastfm_cpu"],
            cwd=args.workdir, env=env, capture_output=True, text=True,
            timeout=14400)
        sys.stderr.write(proc.stderr[-2000:])
        if proc.returncode != 0:
            raise RuntimeError(f"reference run failed rc={proc.returncode}")

    if not (os.path.exists(ours_log) and parse_log(ours_log)[1]):
        from bsarec_tpu.main import main as cli

        cli([*CONFIG, "--epochs", str(args.epochs), "--scan_unroll", "1",
             "--data_dir", DATA, "--output_dir", args.workdir + "/",
             "--train_name", "ours_lastfm_cpu"])

    ref_valid, ref_test = parse_log(ref_log)
    ours_valid, ours_test = parse_log(ours_log)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        fh.write(
            "# BSARec/LastFM head-to-head: mounted reference "
            "(`src/main.py`, torch CPU) vs bsarec_tpu (CPU) — same "
            "machine, dataset, config, seed\n\n"
            f"Winning LastFM config (c=3, alpha=0.9, lr=1e-3, heads=1, "
            f"seed 42), {args.epochs} epochs, full-catalog "
            "seen-masked eval. RNG streams necessarily differ "
            "(torch CUDA-style generator vs JAX threefry), so parity "
            "means same-band trajectories, not bit-equality.\n\n"
            "## Validation trajectory (HR@10 / NDCG@10)\n\n"
            "| epoch | reference | ours |\n|---|---|---|\n")
        for i in range(max(len(ref_valid), len(ours_valid))):
            r = ref_valid[i] if i < len(ref_valid) else None
            o = ours_valid[i] if i < len(ours_valid) else None
            fr = f"{r['HR@10']:.4f} / {r['NDCG@10']:.4f}" if r else "—"
            fo = f"{o['HR@10']:.4f} / {o['NDCG@10']:.4f}" if o else "—"
            fh.write(f"| {i} | {fr} | {fo} |\n")
        fh.write("\n## Final test block\n\n| metric | reference | ours |\n|---|---|---|\n")
        for k in ("HR@5", "NDCG@5", "HR@10", "NDCG@10", "HR@20", "NDCG@20"):
            fh.write(f"| {k} | {ref_test[k]:.4f} | {ours_test[k]:.4f} |\n")
        fh.write("\nRaw logs: " + ref_log + ", " + ours_log + "\n")
    print(json.dumps({"metric": "headtohead_src",
                      "ref_test": ref_test, "ours_test": ours_test}))


if __name__ == "__main__":
    main()
