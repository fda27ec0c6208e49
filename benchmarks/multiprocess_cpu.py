"""2-process execution of the multi-host pipeline on CPU (no TPU pod
needed): the first actual multi-process exercise of
`data/multihost.py`'s HostShardedDataset / global_batch /
init_distributed path (previously only ever run at process_count=1).

Driver mode (default) forks two child processes that form a
`jax.distributed` cluster over localhost (4 virtual CPU devices each,
8 global) and train 2 epochs through `Trainer(--multihost)` on a
deterministic synthetic corpus; then runs the identical config
single-process (8 local devices) and asserts the per-epoch loss
trajectories agree. The global batch schedule is host-independent by
construction (`HostShardedDataset.epoch_batches_from_perm`), so the
trajectories must match to float tolerance.

Usage:
    python benchmarks/multiprocess_cpu.py              # driver: run + compare
    python benchmarks/multiprocess_cpu.py --child I --port P --nprocs N
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_EPOCHS = 2
MESH = "data:4,model:2"


def _child_env(devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    keep = [f for f in env.get("XLA_FLAGS", "").split() if "device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        [f"--xla_force_host_platform_device_count={devices}"] + keep
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def run_child(process_id: int | None, port: int, nprocs: int) -> list[float]:
    """Train N_EPOCHS on the synthetic corpus; multi-process when
    process_id is given, single-process otherwise."""
    import jax

    # restrict backend discovery to cpu BEFORE init: JAX_PLATFORM_NAME
    # alone still initializes the axon PJRT plugin, which hangs forever
    # if the TPU relay is wedged (the children must be TPU-independent)
    jax.config.update("jax_platforms", "cpu")

    if process_id is not None:
        from bsarec_tpu.data.multihost import init_distributed

        init_distributed(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=process_id,
        )
        assert jax.process_count() == nprocs, jax.process_count()

    import logging

    import numpy as np

    from bsarec_tpu.config import ModelConfig, TrainConfig
    from bsarec_tpu.data.corpus import Corpus
    from bsarec_tpu.data.pipeline import SeqRecData
    from bsarec_tpu.train.trainer import Trainer

    # deterministic synthetic corpus (identical on every process)
    rng = np.random.default_rng(0)
    n_items = 31
    seqs = []
    for _ in range(96):
        start = rng.integers(1, n_items - 1)
        length = rng.integers(5, 12)
        seqs.append([(start + i) % (n_items - 1) + 1 for i in range(length)])
    data = SeqRecData(Corpus(user_seq=seqs, max_item=n_items), max_len=10)

    model_cfg = ModelConfig(
        model_type="bsarec", item_size=n_items + 1, num_users=97,
        max_seq_length=10, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=1, hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1, c=3, alpha=0.7,
    )
    train_cfg = TrainConfig(
        lr=0.01, batch_size=32, epochs=N_EPOCHS, seed=11, log_freq=100,
        mesh=MESH, multihost=True,
        # correctness harness on 1-core CPU hosts: keep the epoch-scan
        # body single-copy so three sequential compiles stay cheap
        scan_unroll=1,
    )
    logger = logging.getLogger("mp")
    logger.addHandler(logging.NullHandler())
    logger.propagate = False
    trainer = Trainer(model_cfg, train_cfg, data, logger, "/tmp/mp_unused.ckpt")
    losses = [trainer.train(e) for e in range(N_EPOCHS)]
    if process_id in (None, 0):
        print("LOSSES " + json.dumps(losses), flush=True)
    return losses


def _parse_losses(out: str) -> list[float]:
    for line in out.splitlines():
        if line.startswith("LOSSES "):
            return json.loads(line[len("LOSSES "):])
    raise RuntimeError(f"no LOSSES line in output:\n{out}")


def run_driver(port: int = 12357) -> int:
    here = os.path.abspath(__file__)
    # 2-process cluster, 4 devices each
    procs = [
        subprocess.Popen(
            [sys.executable, here, "--child", str(i), "--port", str(port),
             "--nprocs", "2"],
            env=_child_env(4), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    # inner timeouts must stay below any caller's (test_multihost.py
    # gives the whole driver 850 s): on a hang, reap and kill OUR exact
    # child pids here instead of leaving orphans holding the coordinator
    # port after an outer kill.
    try:
        outs = [p.communicate(timeout=390)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
        outs = [p.communicate()[0] for p in procs]
        print(f"--- child hang (killed) ---\n{outs[0]}\n{outs[1]}")
        return 1
    for i, p in enumerate(procs):
        if p.returncode != 0:
            print(f"--- child {i} failed (rc {p.returncode}) ---\n{outs[i]}")
            return 1
    multi = _parse_losses(outs[0])

    # single-process baseline: same config, 8 local devices
    single_p = subprocess.run(
        [sys.executable, here, "--single"],
        env=_child_env(8), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=390,
    )
    if single_p.returncode != 0:
        print(f"--- single-process run failed ---\n{single_p.stdout}")
        return 1
    single = _parse_losses(single_p.stdout)

    print(f"2-process losses:      {multi}")
    print(f"single-process losses: {single}")
    ok = all(abs(a - b) < 5e-4 * max(1.0, abs(b)) for a, b in zip(multi, single))
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--port", type=int, default=12357)
    ap.add_argument("--nprocs", type=int, default=2)
    args = ap.parse_args()
    if args.child is not None:
        run_child(args.child, args.port, args.nprocs)
    elif args.single:
        run_child(None, args.port, 1)
    else:
        sys.exit(run_driver(args.port))


if __name__ == "__main__":
    main()
