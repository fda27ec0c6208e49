"""Beauty seed-42 trajectory head-to-head: mounted reference program
(torch CPU) vs this framework vs the authors' committed GPU log.

VERDICT r4 item 2(b): the reference program has never been run on
Beauty on this machine. A full run to its natural early stop
(~65 epochs, `src/output/BSARec_Beauty_best.log`) costs ~5.8 min/epoch
on this 1-core CPU host — ~6.5 h, beyond one round's wall clock — so the
bounded evidence is the per-epoch VALIDATION trajectory: run
`src/main.py --data_name Beauty` under a hard timeout and table its
valid metrics at every epoch it reaches against (a) our round-4
seed-42 full run at the identical winning config
(`results/r4_runs/q4_Beauty_threefry_seed42.log`) and (b) the authors'
GPU log. All three are seed 42 at c=5 alpha=0.7 lr=5e-4 heads=1; RNG
streams necessarily differ, so the comparison is trajectory-level, not
bit-level.

Usage:
    python benchmarks/headtohead_beauty_traj.py \
        [--ref-log /tmp/h2h_beauty/ref_beauty_s42.log] [--out ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.headtohead_src import parse_log

OURS = "results/r4_runs/q4_Beauty_threefry_seed42.log"
GPU = "/root/reference/src/output/BSARec_Beauty_best.log"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ref-log", default="/tmp/h2h_beauty/ref_beauty_s42.log")
    p.add_argument("--ours-log", default=OURS)
    p.add_argument("--out", default="results/r5_runs/headtohead_beauty_traj.md")
    args = p.parse_args()

    ref_valid, ref_test = parse_log(args.ref_log)
    ours_valid, ours_test = parse_log(args.ours_log)
    gpu_valid, gpu_test = parse_log(GPU)
    by_epoch = lambda rows: {d["epoch"]: d for d in rows}  # noqa: E731
    ours_e, gpu_e = by_epoch(ours_valid), by_epoch(gpu_valid)

    with open(args.out, "w") as fh:
        fh.write(
            "# Beauty seed-42 trajectory head-to-head: reference program "
            "(torch CPU, this machine) vs bsarec_tpu vs authors' GPU log\n\n"
            "All three runs: BSARec, c=5 alpha=0.7 lr=5e-4 heads=1 "
            "batch=256 dropout=0.5 seed=42 (the published winning config, "
            "`src/output/BSARec_Beauty_best.log:1`). The reference leg is "
            "bounded by wall clock (~5.8 min/epoch on this 1-core host; its "
            "natural early stop is ~epoch 65, a ~6.5 h run), so this compares the "
            "validation trajectory over the epochs it reached.\n\n"
            "## Validation metrics per epoch (valid split)\n\n"
            "| epoch | ref-this-machine NDCG@20 | ours NDCG@20 | "
            "authors-GPU NDCG@20 | ref HR@5 | ours HR@5 | GPU HR@5 |\n"
            "|---|---|---|---|---|---|---|\n")
        for d in ref_valid:
            e = d["epoch"]
            o, g = ours_e.get(e), gpu_e.get(e)
            cell = lambda r, m: f"{r[m]:.4f}" if r else "—"  # noqa: E731
            fh.write(
                f"| {e} | {d['NDCG@20']:.4f} | {cell(o, 'NDCG@20')} | "
                f"{cell(g, 'NDCG@20')} | {d['HR@5']:.4f} | "
                f"{cell(o, 'HR@5')} | {cell(g, 'HR@5')} |\n")
        fh.write(
            "\nFinal TEST (where available):\n\n"
            "| program | stop epoch | HR@5 | NDCG@5 | HR@10 | NDCG@10 "
            "| HR@20 | NDCG@20 |\n|---|---|---|---|---|---|---|---|\n")
        for label, valid, test in (
            ("reference, this machine", ref_valid, ref_test),
            ("ours (r4 full run)", ours_valid, ours_test),
            ("authors' GPU log", gpu_valid, gpu_test),
        ):
            if test is None:
                fh.write(f"| {label} | (timeout at epoch "
                         f"{valid[-1]['epoch'] if valid else '?'}) |"
                         + " — |" * 6 + "\n")
                continue
            stop = max(valid, key=lambda r: r["NDCG@20"])["epoch"] if valid else "?"
            fh.write(
                f"| {label} | {stop} | " + " | ".join(
                    f"{test[m]:.4f}" for m in (
                        "HR@5", "NDCG@5", "HR@10", "NDCG@10",
                        "HR@20", "NDCG@20")) + " |\n")
    print(f"wrote {args.out} ({len(ref_valid)} ref epochs)")


if __name__ == "__main__":
    main()
