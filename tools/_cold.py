"""Cold-I/O arm support for the bytes-story ladders (round-12 verdict #5):
drop the OS page cache so a timed read actually pays for its bytes. The
scoped-feed, Bloom-skip, and PQ-payload claims all win on bytes but
measure wall-parity on page-cache-warm NVMe; a cold arm is the cheapest
honest way to show wall tracking bytes without an object store."""

from __future__ import annotations

import os
import subprocess


def drop_page_cache() -> bool:
    """``sync; echo 3 > /proc/sys/vm/drop_caches``. Returns False when the
    environment forbids it (unprivileged container) — callers must then
    report the cold arm as unavailable rather than silently timing warm."""
    try:
        subprocess.run(["sync"], check=True, timeout=60)
        with open("/proc/sys/vm/drop_caches", "w") as fh:
            fh.write("3\n")
        return True
    except (OSError, subprocess.SubprocessError):
        return False
