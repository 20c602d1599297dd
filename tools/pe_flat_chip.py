"""Time the PE tp flat-stream exchange's device cost on the REAL chip.

Round 4 chip-measured the legacy slab merge (``merge_gathered``) at
~156 ms/table per 65k chunk (tools/tp_merge_chip.py, SCALING.json) -- more
than the whole single-chip SE program.  Round 5 replaced it in the PE mate
program (parallel.map_mate_sharded): each tp shard flat-compacts its OWN
two strand slabs locally and the tp exchange moves the compacted streams.

This tool times that replacement's device-side work on the attached TPU:
``pe_map.flat_compact`` over a (B, C) strand-slab pair at production
occupancy (~1.5 candidates/read/strand).  The all_gather itself cannot be
run on one chip; its payload is meta (4 B/read) + flat
(8 * flat_factor B/read) = ~2.6 MB per shard at B=65536 / flat_factor=12,
tens of microseconds on ICI -- the compaction math is the contested term,
exactly as it was for the legacy merge.

Writes/updates the tp=2 entry of SCALING.json with
``pe_flat_compact_chip_ms`` and prints a JSON line.  Timing: axon's
block_until_ready does not block, so each rep is fenced with a host fetch.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

B, C = 65536, 32
FLAT_FACTOR = 12  # the PE production default (jax_backend.pe_flat_factor)


def make_slabs():
    """Two (B, C) strand slabs at ~1.5 valid candidates/read/strand."""
    rng = np.random.default_rng(0)
    slabs = []
    for _ in range(2):
        cs = np.full((B, C), -1, dtype=np.int8)
        n1 = rng.random(B) < 0.9
        cs[n1, 0] = rng.integers(0, 3, int(n1.sum()))
        n2 = rng.random(B) < 0.45
        cs[n2, 1] = rng.integers(0, 3, int(n2.sum()))
        cp = rng.integers(0, 2**31, (B, C)).astype(np.uint32)
        cm = rng.integers(0, 7, (B, C)).astype(np.int32)
        slabs.append((cs, cp, cm))
    return slabs


def make_wls():
    """Two synthetic worklists (wl = 3 rows/read) at ~1.5 kept/read."""
    rng = np.random.default_rng(1)
    wls = []
    for _ in range(2):
        Mw = 3 * B
        wlr = np.sort(rng.integers(0, B, Mw)).astype(np.int32)
        keep = rng.random(Mw) < 0.5
        # per-read slab col = rank among kept rows of that read
        col = np.zeros(Mw, dtype=np.int32)
        seen = {}
        kidx = np.flatnonzero(keep)
        for i in kidx:
            r = wlr[i]
            col[i] = seen.get(r, 0)
            seen[r] = col[i] + 1
        pos = rng.integers(0, 2**31, Mw).astype(np.uint32)
        mm = rng.integers(0, 7, Mw).astype(np.int32)
        shift = rng.integers(0, 3, Mw).astype(np.int32)
        wls.append((wlr, col, pos, mm, shift, keep))
    cnts = []
    for wlr, col, pos, mm, shift, keep in wls:
        c = np.zeros(B, dtype=np.int32)
        np.add.at(c, wlr[keep], 1)
        cnts.append(np.minimum(c, C))
    return wls, cnts


def _time(run):
    run()  # compile
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return 1e3 * best


def main() -> int:
    import jax
    import jax.numpy as jnp

    from walt_tpu.ops import pe_map

    slabs_np = make_slabs()
    slabs = [tuple(jnp.asarray(a) for a in s) for s in slabs_np]
    fb = jnp.zeros((B,), bool)

    # dispatch + D2H fence round trip, subtracted from the raw timings
    # (the fence dominates: ~25 ms on this tunnel-attached device)
    triv = jax.jit(lambda x: x[:1])
    rtt = _time(lambda: np.asarray(triv(fb)))

    fn = jax.jit(lambda s0, s1, fb: pe_map.flat_compact([s0, s1], fb,
                                                        FLAT_FACTOR))

    def run():
        meta, flat = fn(slabs[0], slabs[1], fb)
        np.asarray(meta[:1])  # fence (axon block_until_ready is a no-op)

    ms = _time(run)

    # the round-5 production path: flat emission from the worklists
    wls_np, cnts_np = make_wls()
    wls = [tuple(jnp.asarray(a) for a in w) for w in wls_np]
    cnts = [jnp.asarray(c) for c in cnts_np]
    fn2 = jax.jit(lambda w0, w1, c0, c1, fb: pe_map.flat_from_wl(
        [w0, w1], [c0, c1], fb, FLAT_FACTOR, C))

    def run2():
        meta, flat = fn2(wls[0], wls[1], cnts[0], cnts[1], fb)
        np.asarray(meta[:1])

    ms_wl = _time(run2)

    row = {
        "fence_rtt_ms": round(rtt, 2),
        "pe_flat_compact_chip_ms": round(ms - rtt, 2),
        "pe_flat_from_wl_chip_ms": round(ms_wl - rtt, 2),
        "B": B, "C": C, "flat_factor": FLAT_FACTOR,
        "gather_payload_mb_per_shard": round(
            (4 * B + 8 * FLAT_FACTOR * B) / 2**20, 2
        ),
        "device": str(jax.devices()[0].device_kind),
    }
    print(json.dumps(row))

    path = os.path.join(REPO, "SCALING.json")
    try:
        data = json.load(open(path))
        for entry in data:
            if entry.get("tp") == 2:
                entry["pe_flat_compact_chip_ms"] = row[
                    "pe_flat_compact_chip_ms"]
                entry["pe_flat_from_wl_chip_ms"] = row[
                    "pe_flat_from_wl_chip_ms"]
                entry["pe_flat_note"] = (
                    "round 5: map_mate_sharded exchanges per-shard "
                    "flat-compacted streams (this compaction + an "
                    f"all_gather of {row['gather_payload_mb_per_shard']} "
                    "MB/shard) instead of the legacy slab merge"
                )
        with open(path, "w") as f:
            json.dump(data, f, indent=1)
    except Exception as e:
        print(f"SCALING.json not updated: {e!r}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
