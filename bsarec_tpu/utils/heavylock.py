"""Host-wide exclusive lock for heavy jobs (wedge-proofing).

The suspected trigger for the round-3 axon-relay wedge was heartbeat
starvation on this 1-core host: a CPU-heavy quality run + pytest were
live while bench.py held the chip (VERDICT r3 item 7, project memory).
Every heavy job — on-chip benches AND CPU-heavy scripts — therefore
serializes on one flock file. Shell scripts take the same lock with
util-linux flock:

    exec 9>/tmp/bsarec_tpu_heavy.lock; flock 9   # blocks until free

The lock is advisory and auto-releases when the process exits (no stale
lock files to clean up after a crash).
"""

from __future__ import annotations

import fcntl
import os
import sys

LOCK_PATH = "/tmp/bsarec_tpu_heavy.lock"

_held = []  # keep the fd alive for the process lifetime


def _lock_fd_inherited() -> bool:
    """True if an ancestor's lock fd was inherited (e.g. the recovery
    queue's `exec 9>lock; flock 9`) — the flock lives on the shared open
    file description, so this process already holds it and re-flocking a
    fresh descriptor would deadlock against our own parent."""
    try:
        fds = os.listdir("/proc/self/fd")
    except OSError:
        return False
    for fd in fds:
        try:
            if os.readlink(f"/proc/self/fd/{fd}") == LOCK_PATH:
                return True
        except OSError:
            continue
    return False


def acquire(label: str = "", block: bool = True) -> bool:
    """Take the host-wide heavy-job lock; held until process exit.

    Returns True on acquisition; with block=False, returns False
    immediately if another heavy job holds it.
    """
    if os.environ.get("BSAREC_NO_HEAVYLOCK") == "1":
        return True  # explicit bypass: tiny CPU smokes that must not queue
    if _held or _lock_fd_inherited():
        return True  # reentrant: we (or an ancestor sharing our fd) hold it
    fh = open(LOCK_PATH, "w")
    try:
        fcntl.flock(fh, fcntl.LOCK_EX | (0 if block else fcntl.LOCK_NB))
    except BlockingIOError:
        fh.close()
        return False
    if label:
        fh.write(label + "\n")
        fh.flush()
    _held.append(fh)
    return True


def main():  # `python -m bsarec_tpu.utils.heavylock` — wait for quiet
    acquire("probe")
    print("heavy-job lock acquired (host quiet)")


if __name__ == "__main__":
    sys.exit(main())
