"""Host allocator tuning for page-fault-expensive environments.

glibc serves allocations above the mmap threshold (128 KB default) with a
fresh mmap and unmaps them on free, so every large NumPy temporary is paid
for in page faults.  On virtualized TPU hosts page faults are often an
order of magnitude slower than on bare metal (observed: a 16 MB broadcast
add costing 100x its compute in fault time), which taxes the entire host
pipeline -- FASTQ parsing, index deserialization, batch packing.

Raising M_MMAP_THRESHOLD and disabling trim keeps large blocks in the heap
where they are reused across temporaries.  This is process-global and
idempotent; failures (musl, non-Linux) are ignored.
"""

from __future__ import annotations

import ctypes
import sys

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_done = False


def tune_malloc(mmap_threshold: int = 1 << 30) -> bool:
    """mallopt(M_MMAP_THRESHOLD, 1GB) + mallopt(M_TRIM_THRESHOLD, -1)."""
    global _done
    if _done:
        return True
    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, mmap_threshold)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, -1)
        _done = bool(ok1) and bool(ok2)
    except (OSError, AttributeError):
        return False
    return _done
