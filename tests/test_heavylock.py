"""Host-wide heavy-job lock (wedge-proofing, CLAUDE.md).

Regression for the round-4 queue deadlock: the recovery queue holds the
flock via bash `exec 9>lock; flock 9`, and its child bench.py then tried
to take the same lock on a FRESH file description — blocking forever on
its own parent (both 30-min driver-bench timeouts in
results/r4_runs/bench_r4*.log were this). acquire() must treat an
inherited lock fd as already-held.
"""

import subprocess
import sys


def _child(code: str) -> str:
    script = f"""
exec 9>/tmp/hl_pytest.lock
flock 9
timeout 20 {sys.executable} -c '{code}'
"""
    r = subprocess.run(["bash", "-c", script], capture_output=True, text=True,
                       timeout=60)
    return r.stdout + r.stderr


def test_acquire_is_reentrant_under_inherited_parent_flock():
    out = _child(
        "import bsarec_tpu.utils.heavylock as hl; "
        "hl.LOCK_PATH = \"/tmp/hl_pytest.lock\"; "
        "print(\"GOT\", hl.acquire(\"t\"))"
    )
    assert "GOT True" in out, out


def test_acquire_nonblocking_fails_without_inherited_fd():
    # close fd 9 before exec: the child has no inherited description, so
    # the parent's exclusive flock must make a non-blocking acquire fail
    out = _child(
        "import bsarec_tpu.utils.heavylock as hl; "
        "hl.LOCK_PATH = \"/tmp/hl_pytest.lock\"; "
        "import os; os.close(9); "
        "print(\"GOT\", hl.acquire(\"t\", block=False))"
    )
    assert "GOT False" in out, out
