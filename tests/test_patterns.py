"""Device-vs-oracle differential coverage for seed patterns 5 and 7.

The golden tests pin pattern 3 (the reference's compile-time default); the
alternative patterns (seedpattern.hpp:29-352, selected by -D SEEDPATTERN*)
are validated by table-identity tests (test_constants) plus this
differential: the device pipeline must reproduce the host oracle's
candidate streams exactly under each pattern's tables, including pattern
7's shorter minimum read length and 7-shift seed schedule.
"""

import numpy as np
import pytest

from walt_tpu.constants import get_pattern
from walt_tpu.index import io_walt


def _streams_equal(a, b):
    return [(int(x), int(y), int(z)) for x, y, z in a] == [
        (int(x), int(y), int(z)) for x, y, z in b
    ]


@pytest.fixture(scope="module", params=["5", "7"])
def pat_setup(request, work, tmp_path_factory):
    from walt_tpu.index.build import build_all_tables
    from walt_tpu.index.io_walt import write_index

    pattern = get_pattern(request.param)
    d = tmp_path_factory.mktemp(f"pat{request.param}")
    prefix = str(d / "p.dbindex")
    genome, tables = build_all_tables(
        [str(work / "genome.fa")], pattern, verbose=False
    )
    write_index(prefix, genome, tables)
    genome_meta, _ = io_walt.read_head(prefix)
    g, ht = io_walt.read_table(prefix + "_CT00", genome_meta)
    return pattern, g, ht


@pytest.mark.parametrize("ag_wildcard", [False, True])
def test_differential_patterns(pat_setup, work, ag_wildcard):
    from tests.conftest import simulate_reads, write_fastq
    from walt_tpu.core.backends import NumpyBackend
    from walt_tpu.core.jax_backend import JaxBackend
    from walt_tpu.genome import load_genome
    from walt_tpu.host.fastq import FgetsLines, load_batch

    pattern, g, ht = pat_setup
    gen = load_genome([str(work / "genome.fa")])
    rng = np.random.default_rng(int(pattern.name) * 101)
    recs = simulate_reads(gen, rng, 120, 80)
    # pattern-specific short reads straddling the minimum length
    recs += simulate_reads(gen, rng, 20, pattern.min_read_len + 2,
                           name_prefix="s")
    recs += simulate_reads(gen, rng, 10, max(8, pattern.min_read_len - 2),
                           name_prefix="t")
    path = work / f"pat{pattern.name}_{ag_wildcard}.fq"
    write_fastq(path, recs)
    batch = load_batch(FgetsLines(str(path)), 10**6)
    codes, lens = batch.packed()

    ref = NumpyBackend().map_strand(codes, lens, g, ht, ag_wildcard, 5000, 6,
                                    pattern)
    got = JaxBackend().map_strand(codes, lens, g, ht, ag_wildcard, 5000, 6,
                                  pattern)
    bad = [i for i in range(len(ref)) if not _streams_equal(ref[i], got[i])]
    assert not bad, f"{len(bad)} reads diverge, first: {bad[:5]}"
