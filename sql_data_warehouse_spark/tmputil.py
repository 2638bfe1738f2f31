"""Process-scoped scratch directories.

Streaming landing zones, checkpoints, and txn-table warehouse roots
need to live for the rest of the Spark session (a checkpoint removed
mid-stream corrupts the query; a landing zone is re-read by every
``stream_*`` registry entry), so per-call cleanup is wrong — but
``tempfile.mkdtemp`` alone leaks the dirs across process exits and a
week of registry runs fills /tmp. Every temp dir in the package goes
through :func:`scratch_dir`, which registers one atexit sweep:
process exit leaves /tmp no larger than before the run.

Call sites that CAN clean earlier (e.g. the per-drain memory-sink
checkpoints) still do — the exit sweep is ``ignore_errors`` and
double-removal is a no-op.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_CREATED: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp that is removed at interpreter exit."""
    path = tempfile.mkdtemp(prefix=prefix)
    _CREATED.append(path)
    return path


@atexit.register
def _cleanup() -> None:
    while _CREATED:
        shutil.rmtree(_CREATED.pop(), ignore_errors=True)
