"""Lightweight per-stage wall-clock accounting + optional profiler capture.

The reference's only tracing is a clock() wrapper macro and a mapping_time
line under -v (util.hpp:80-87, mapping.cpp:524).  Here every pipeline stage
books its wall time into a process-wide table so a run can say WHERE time
went (device dispatch+fetch vs host fallback replay vs parse vs emission) --
the numbers that decide batching/tiering policy (see PERF.md).

Enabled by WALTX_PERF=1 (stderr report at the end of each run) and always
collected when cheap.  WALTX_PROFILE_DIR=<dir> additionally captures a
jax.profiler trace of the mapping loop (viewable in TensorBoard /
Perfetto), the TPU-native analog of TIME_INFO.
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict
from contextlib import contextmanager

_stages: dict = defaultdict(float)
_counts: dict = defaultdict(int)


def enabled() -> bool:
    return os.environ.get("WALTX_PERF", "") == "1"


_t_start = time.perf_counter()


def note(msg: str) -> None:
    """Timestamped progress line to stderr (WALTX_PROGRESS=1 or WALTX_PERF=1).

    Long silent phases (multi-GB table uploads over a ~30 MB/s tunnel,
    multi-minute first compiles) made the round-2 bench look hung; every
    such phase now announces itself.
    """
    if enabled() or os.environ.get("WALTX_PROGRESS", "") == "1":
        print(f"[waltx +{time.perf_counter() - _t_start:8.1f}s] {msg}",
              file=sys.stderr, flush=True)


def add(stage: str, seconds: float, n: int = 1) -> None:
    _stages[stage] += seconds
    _counts[stage] += n


@contextmanager
def stage(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        add(name, time.perf_counter() - t0)


def reset() -> None:
    _stages.clear()
    _counts.clear()


def snapshot() -> dict:
    return {k: round(v, 4) for k, v in sorted(_stages.items())}


def report(header: str = "waltx perf") -> None:
    if not _stages:
        return
    total = sum(_stages.values())
    print(f"[{header}]", file=sys.stderr)
    for k in sorted(_stages, key=_stages.get, reverse=True):
        v = _stages[k]
        print(
            f"  {k:<28} {v:8.3f}s  {100 * v / max(total, 1e-9):5.1f}%"
            f"  x{_counts[k]}",
            file=sys.stderr,
        )


@contextmanager
def profiler_trace():
    """jax.profiler capture around the mapping loop (WALTX_PROFILE_DIR)."""
    d = os.environ.get("WALTX_PROFILE_DIR", "")
    if not d:
        yield
        return
    import jax

    jax.profiler.start_trace(d)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"[waltx profile trace written to {d}]", file=sys.stderr)
