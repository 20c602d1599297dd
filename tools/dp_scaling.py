"""dp-scaling efficiency on a virtual CPU mesh (directional, not absolute).

Runs the production sharded SE step (JaxBackend with a mesh) on 1, 2, 4, 8
virtual CPU devices over the same synthetic workload and reports
reads/s and scaling efficiency vs 1 device.  CPU-mesh numbers say nothing
about TPU absolute throughput, but they do exercise the real partitioning:
XLA compiles one program per mesh shape, reads are dp-sharded, candidate
merges ride the (virtual) collectives.  The north-star target is >=80%
efficiency 1 chip -> N (BASELINE.json); on real hardware the dp axis has no
cross-chip communication at all in the SE step (table replicated, fold
per-read), so efficiency is bounded by compile-shape and host-side effects,
both of which this harness surfaces.

Usage:  python tools/dp_scaling.py [n_reads]
Writes a JSON summary line per mesh size.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    # one XLA intra-op thread per virtual device: otherwise every virtual
    # device fans its ops over ALL cores and N-device runs just time-slice
    # the same pool (round-1 SCALING.json measured that, not dp scaling)
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
        " --xla_cpu_multi_thread_eigen=false"
        " intra_op_parallelism_threads=1"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 32_768

    from walt_tpu.constants import get_pattern
    from walt_tpu.core.jax_backend import JaxBackend
    from walt_tpu.index.build import build_table
    from walt_tpu.parallel import make_mesh
    from walt_tpu.synth import make_genome_repetitive, sample_reads

    pattern = get_pattern("3")
    genome = make_genome_repetitive(8_000_000, n_chroms=2, seed=3)
    tables = [build_table(genome, c, pattern, verbose=False)
              for c in ("CT00", "CT01")]
    codes, lens, _ = sample_reads(genome, n_reads, 100, seed=5)

    # virtual devices beyond the physical core count (4 here) would
    # time-slice cores and measure the host, not the partitioning
    import multiprocessing

    ncores = multiprocessing.cpu_count()
    results = []
    base = None
    for nd in (1, 2, 4, 8):
        devs = jax.devices()[:nd]
        if len(devs) < nd or nd > ncores:
            break
        backend = JaxBackend(
            mesh=make_mesh(devs, tp=1) if nd > 1 else None,
            chunk=n_reads, small_chunk=n_reads,
        )
        run = lambda: backend.map_single_end(  # noqa: E731
            codes, lens, tables, 5000, 6, pattern
        )
        run()  # compile + settle heuristics
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = run()
        dt = (time.perf_counter() - t0) / reps
        rps = n_reads / dt
        if base is None:
            base = rps
        eff = rps / (base * nd)
        results.append(dict(
            devices=nd, reads_per_s=round(rps, 1),
            efficiency_vs_1dev=round(eff, 3),
            fallback=int(out[4].sum()),
        ))
        print(json.dumps(results[-1]))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SCALING.json"), "w") as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
