"""Device pipeline correctness: differential vs the exact host enumerator,
and end-to-end golden equivalence through the JAX backend."""

import filecmp
import os
import subprocess

import numpy as np
import pytest

from walt_tpu.constants import get_pattern
from walt_tpu.index import io_walt


def _streams_equal(a, b):
    return [(int(x), int(y), int(z)) for x, y, z in a] == [
        (int(x), int(y), int(z)) for x, y, z in b
    ]


@pytest.fixture(scope="module")
def table(my_index):
    genome_meta, _ = io_walt.read_head(my_index)
    return io_walt.read_table(my_index + "_CT00", genome_meta)


@pytest.mark.parametrize("ag_wildcard", [False, True])
@pytest.mark.parametrize("b,max_mm", [(5000, 6), (3, 6), (5000, 0)])
def test_differential_vs_oracle(work, my_index, table, se_fastq, ag_wildcard,
                                b, max_mm):
    from walt_tpu.core.backends import NumpyBackend
    from walt_tpu.core.jax_backend import JaxBackend
    from walt_tpu.host.fastq import FgetsLines, load_batch

    g, ht = table
    pattern = get_pattern("3")
    batch = load_batch(FgetsLines(se_fastq), 10**6)
    codes, lens = batch.packed()
    ref = NumpyBackend().map_strand(codes, lens, g, ht, ag_wildcard, b, max_mm, pattern)
    got = JaxBackend().map_strand(codes, lens, g, ht, ag_wildcard, b, max_mm, pattern)
    bad = [i for i in range(len(ref)) if not _streams_equal(ref[i], got[i])]
    assert not bad, f"{len(bad)} reads diverge, first: {bad[:5]}"


def test_small_slabs_force_fallback(work, my_index, table, se_fastq):
    """Tiny device slabs must still give exact results via fallback."""
    from walt_tpu.core.backends import NumpyBackend
    from walt_tpu.core.jax_backend import JaxBackend
    from walt_tpu.host.fastq import FgetsLines, load_batch

    g, ht = table
    pattern = get_pattern("3")
    batch = load_batch(FgetsLines(se_fastq), 10**6)
    codes, lens = batch.packed()
    ref = NumpyBackend().map_strand(codes, lens, g, ht, False, 5000, 6, pattern)
    jb = JaxBackend(verify_slab=2, cand_slab=2)
    got = jb.map_strand(codes, lens, g, ht, False, 5000, 6, pattern)
    assert all(_streams_equal(r, o) for r, o in zip(ref, got))
    assert jb.fallback_reads > 0  # the tiny slabs actually overflowed


def test_golden_jax_backend(work, ref_walt, ref_index, se_fastq, pe_fastq):
    from walt_tpu.core.jax_backend import JaxBackend
    from walt_tpu.core.paired_end import process_paired_end
    from walt_tpu.core.single_end import process_single_end

    be = JaxBackend()
    ref_out = str(work / "ref_jx.out")
    my_out = str(work / "my_jx.out")
    for out in (ref_out, my_out):
        open(out, "w").close()
        open(out + ".mapstats", "w").close()
    subprocess.run(
        [ref_walt, "-i", ref_index, "-r", se_fastq, "-1", pe_fastq[0],
         # small -N: the reference preallocates O(N) strings/heaps per batch
         # (paired.cpp:598-607) -- minutes of page faults at the 10M default
         "-2", pe_fastq[1], "-o", ref_out, "-sam", "-N", "100000"],
        check=True, capture_output=True,
    )
    process_single_end(ref_index, se_fastq, my_out, sam=True, backend=be)
    process_paired_end(ref_index, pe_fastq[0], pe_fastq[1], my_out, sam=True,
                       backend=be)
    for suf in ("", ".mapstats"):
        assert filecmp.cmp(ref_out + suf, my_out + suf, shallow=False), suf
