"""Throughput benchmark: end-to-end single-end mapping, reads/s on one chip.

Workload: synthetic 4 Mbp genome, 200k 100bp bisulfite reads, full SE pipeline
(FASTQ parse -> device seed/refine/verify -> host best-hit replay -> MR
emission) with the JAX backend, both strand tables, -m 6 defaults.

Baseline: the reference maps SRR1532534 (50M x ~100bp reads, hg19) single-end
in 0.71 h on one 2.4 GHz Xeon thread (BASELINE.md Table S6) = ~19.6k reads/s.
The synthetic workload is easier per-read than hg19 (no repeats), so this
overstates small-genome throughput; vs_baseline is still the honest published
anchor until an hg19-scale run exists.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_READS_PER_SEC = 50_000_000 / (0.71 * 3600)  # Table S6, SRR1532534 SE

CACHE = "/tmp/waltx_bench"
N_BASES = 4_000_000
# 200k reads: enough work that per-batch fixed costs (tunnel round trips,
# compile-cache lookups) amortize and the number reflects steady-state
# throughput rather than launch latency
N_READS = 200_000
READ_LEN = 100
# batch size chosen so the run is several batches: the driver's software
# pipeline then hides FASTQ parse, host-fallback replay, and MR emission of
# neighboring batches under each batch's device time (and 65536 tiles into
# exactly two full-size device chunks)
BATCH = 65_536


def _prepare():
    os.makedirs(CACHE, exist_ok=True)
    fasta = os.path.join(CACHE, "genome.fa")
    index = os.path.join(CACHE, "bench.dbindex")
    fastq = os.path.join(CACHE, "reads.fastq")
    stamp = os.path.join(CACHE, f"v1_{N_BASES}_{N_READS}_{READ_LEN}.ok")
    if not os.path.exists(stamp):
        from walt_tpu.index.build import build_all_tables
        from walt_tpu.index.io_walt import write_index
        from walt_tpu.synth import (
            codes_to_fastq, make_genome, sample_reads, write_genome_fasta,
        )

        genome = make_genome(N_BASES, n_chroms=2, seed=42)
        write_genome_fasta(genome, fasta)
        codes, lens, _ = sample_reads(genome, N_READS, READ_LEN, seed=7)
        codes_to_fastq(codes, lens, fastq)
        g, tables = build_all_tables([fasta], verbose=False)
        write_index(index, g, tables)
        open(stamp, "w").close()
    return index, fastq


def main() -> int:
    from walt_tpu.hostmem import prefault

    prefault()
    index, fastq = _prepare()
    out = os.path.join(CACHE, "out.mr")

    from walt_tpu.core.backends import get_backend
    from walt_tpu.core.single_end import process_single_end

    backend = get_backend("jax")

    # warmup: identical shapes to the measured run, so every program is
    # compiled (and the backend's phase heuristics are settled) beforehand
    open(out, "w").close()
    open(out + ".mapstats", "w").close()
    process_single_end(index, fastq, out, batch_size=BATCH,
                       max_mismatches=6, backend=backend)

    # best of 3: this host class freezes the VM for O(seconds) at random,
    # so a single wall-clock sample understates steady-state throughput
    dt = float("inf")
    for _ in range(3):
        open(out, "w").close()
        open(out + ".mapstats", "w").close()
        t0 = time.perf_counter()
        stat = process_single_end(index, fastq, out, batch_size=BATCH,
                                  max_mismatches=6, backend=backend)
        dt = min(dt, time.perf_counter() - t0)

    value = N_READS / dt
    print(
        f"mapped {N_READS} reads in {dt:.2f}s "
        f"({stat.unique} unique, {stat.ambiguous} ambiguous, "
        f"{stat.unmapped} unmapped; "
        f"{backend.fallback_reads}/{backend.total_reads} host-fallback)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "se_reads_per_sec_1chip",
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round(value / BASELINE_READS_PER_SEC, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
