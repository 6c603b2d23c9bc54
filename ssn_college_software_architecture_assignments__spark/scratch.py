"""Process-lifetime scratch directories with guaranteed reclamation.

Every operator that needs an on-disk fixture (lake roots, stream
checkpoints, bucketed-table warehouses, .env files) allocates through
:func:`scratch_dir` instead of calling ``tempfile.mkdtemp`` directly.
The returned directory lives until interpreter exit, then a single
``atexit`` janitor removes everything — so repeated bench/oracle
sweeps in one process no longer accumulate unbounded temp-dir litter
(review-caught: t11/s20/s21 each leaked a lake + checkpoint pair per
invocation).

Lifetime contract: directories are PER-PROCESS, not per-call. Spark's
``addPyFile`` and parquet readers copy/own what they need, so removing
the source trees at exit is safe; nothing in the package reads a
scratch dir from a later process.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import threading

_LOCK = threading.Lock()
_DIRS: list[str] = []
_REGISTERED = False


def _janitor() -> None:
    for d in _DIRS:
        shutil.rmtree(d, ignore_errors=True)


def scratch_dir(prefix: str) -> str:
    """``tempfile.mkdtemp`` plus end-of-process reclamation."""
    global _REGISTERED
    d = tempfile.mkdtemp(prefix=prefix)
    with _LOCK:
        if not _REGISTERED:
            atexit.register(_janitor)
            _REGISTERED = True
        _DIRS.append(d)
    return d
