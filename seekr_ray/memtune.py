"""glibc allocator tuning for the serving process's large-array paths.

numpy buffers above glibc's default 128 KiB threshold are mmap'd and
returned to the OS on free, so every hot-term phrase walk re-faults its
working set page by page — measured 15-20x stalls on overcommitted VMs
(2.7 s vs 0.15 s for an identical 6M-element pipeline).  Raising
M_MMAP_THRESHOLD keeps big buffers on the brk heap, disabling trim keeps
the heap's pages resident across queries, and a one-time prefault (touch
one element per 4 KiB page of a zeroed scratch buffer) moves the
first-touch cost off the query path into engine startup (~0.4 s for
256 MiB).

No-op (returns False) off glibc; idempotent per process.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_done = False


def tune_allocator(prefault_mb: int | None = None) -> bool:
    """Apply mallopt tuning + heap prefault once per process.  Size via
    ``prefault_mb`` or ``SEEKR_PREFAULT_MB`` (default 256; 0 skips the
    prefault but keeps the mallopt settings)."""
    global _done
    if _done:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(_M_TRIM_THRESHOLD, -1)
    except Exception:
        return False
    mb = (
        prefault_mb
        if prefault_mb is not None
        else int(os.environ.get("SEEKR_PREFAULT_MB", "256"))
    )
    if mb > 0:
        warm = np.zeros((mb << 20) // 8, dtype=np.uint64)
        warm[::512] = 1  # one element per 4 KiB page
        del warm
    _done = True
    return True
