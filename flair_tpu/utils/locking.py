"""Cooperative single-chip TPU lock.

This machine exposes ONE real TPU chip through a remote tunnel that is
known to wedge for hours when a client dies mid-operation (PERF.md).
Several independent measurement clients exist — the resident bench retry
loop, the round measurement queue (tools/measure_r03.sh), the profilers,
and the driver's own end-of-round ``bench.py`` run — and nothing remote
arbitrates between them. This module gives them a cooperative ``flock``
on a repo-local file so device users serialize instead of colliding.

``flock`` releases automatically when the holder's fd closes, including
on SIGKILL — a killed measurement run can never leave the lock stuck.

The reference has no equivalent (single local CUDA GPU, one process);
this is infrastructure for the shared-tunnel environment only.
"""

from __future__ import annotations

import errno
import fcntl
import os
import time
from typing import IO, Optional

_DEFAULT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".tpu_lock",
)

# module-level reference so a process-lifetime hold survives GC
_held: Optional[IO[bytes]] = None


def acquire_tpu_lock(
    timeout_s: float = 0.0, path: str | None = None
) -> Optional[IO[bytes]]:
    """Try to take the exclusive chip lock; hold it for process lifetime.

    Returns the open file object on success (kept alive module-globally;
    the lock drops when the process exits) or None if it stayed busy for
    ``timeout_s`` seconds. ``timeout_s=0`` means one non-blocking attempt.
    """
    global _held
    if _held is not None:
        return _held
    p = path or _DEFAULT_PATH
    f = open(p, "a+b")  # noqa: SIM115 - held for process lifetime
    deadline = time.time() + timeout_s
    while True:
        try:
            fcntl.flock(f.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
            try:
                f.seek(0)
                f.truncate()
                f.write(f"{os.getpid()} {time.strftime('%FT%T')}\n".encode())
                f.flush()
            except OSError:
                pass
            _held = f
            return f
        except OSError as e:
            if e.errno not in (errno.EAGAIN, errno.EACCES):
                f.close()
                raise
            if time.time() >= deadline:
                f.close()
                return None
            time.sleep(min(10.0, max(0.5, deadline - time.time())))


def tpu_lock_needed() -> bool:
    """The lock only matters when this process targets the real chip."""
    plats = os.environ.get("JAX_PLATFORMS", "")
    return plats in ("", "axon") or "axon" in plats
