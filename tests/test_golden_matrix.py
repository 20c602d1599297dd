"""Golden-matrix rows the round-3 verdict flagged as untested.

Three flag combinations whose behavior was implemented by reading the
reference code but never diffed against the binary:

- ``-A -sam``: OutputSingleSAM ignores AG_WILDCARD -- SAM reports the
  original read un-reverse-complemented even for A-rich wildcard mapping,
  unlike MR output (mapping.cpp:384-419 vs :362-367);
- paired-end ``-C T_adaptor:A_adaptor``: per-mate adaptors
  (util.hpp:221-233, paired.cpp:620-648), including the clip-then-
  randomize tail quirk under the per-batch srand(0) stream;
- several SE read files sharing ONE output: the driver truncates the
  output up front, then every run appends (walt.cpp:214-233,
  mapping.cpp:460), with mapstats accumulating per run.
"""

import filecmp
import os
import subprocess

import numpy as np
import pytest

from tests.conftest import simulate_pairs, simulate_reads, write_fastq


def _cmp(a, b, label):
    assert os.path.exists(a) == os.path.exists(b), f"{label}: presence"
    if os.path.exists(a):
        assert filecmp.cmp(a, b, shallow=False), label


def _clear(*outs):
    for out in outs:
        for suf in ("", ".mapstats"):
            open(out + suf, "w").close()


def test_ag_wildcard_sam_golden(work, ref_walt, ref_index, se_fastq):
    """-A combined with -sam (mapping.cpp:384-419 ignores AG_WILDCARD)."""
    from walt_tpu.core.single_end import process_single_end

    ref_out = str(work / "ref_se_A_sam.out")
    my_out = str(work / "my_se_A_sam.out")
    _clear(ref_out, my_out)
    subprocess.run(
        [ref_walt, "-i", ref_index, "-r", se_fastq, "-o", ref_out,
         "-A", "-sam", "-N", "100000"],
        check=True, capture_output=True,
    )
    process_single_end(ref_index, se_fastq, my_out, ag_wildcard=True,
                       sam=True)
    for suf in ("", ".mapstats"):
        _cmp(ref_out + suf, my_out + suf, f"se_A_sam{suf}")


T_ADAPTOR = "AGATCGGAAGAGCACACGTCT"
A_ADAPTOR = "AGATCGGAAGAGCGTCGTGTA"


@pytest.fixture(scope="module")
def pe_fastq_clippable(work):
    """Pairs >= 14 bp with mate-specific adaptor read-through.

    (The reference segfaults clipping reads under its 14-byte head window,
    util.hpp:204; all reads here are 75 bp.)
    """
    from walt_tpu.genome import load_genome

    g = load_genome([str(work / "genome.fa")])
    rng = np.random.default_rng(29)
    r1, r2 = simulate_pairs(g, rng, 90, 75)

    def readthrough(recs, adaptor):
        out = []
        for i, (name, seq, qual) in enumerate(recs):
            if i % 3 == 0:
                cut = int(rng.integers(30, 70))
                seq = (seq[:cut] + adaptor * 4)[:75]
            out.append((name, seq, qual))
        return out

    p1, p2 = work / "pec_1.fq", work / "pec_2.fq"
    write_fastq(p1, readthrough(r1, T_ADAPTOR))
    write_fastq(p2, readthrough(r2, A_ADAPTOR))
    return str(p1), str(p2)


def test_pe_adaptor_pair_golden(work, ref_walt, ref_index, pe_fastq_clippable):
    """PE -C 'T_adaptor:A_adaptor' (util.hpp:221-233): mate 1 clipped with
    the T adaptor, mate 2 with the A adaptor, tails N-filled then
    randomized by the srand(0) stream (the clip-then-randomize quirk)."""
    from walt_tpu.core.paired_end import process_paired_end

    adaptor = f"{T_ADAPTOR}:{A_ADAPTOR}"
    ref_out = str(work / "ref_pe_clip.out")
    my_out = str(work / "my_pe_clip.out")
    _clear(ref_out, my_out)
    subprocess.run(
        [ref_walt, "-i", ref_index, "-1", pe_fastq_clippable[0],
         "-2", pe_fastq_clippable[1], "-o", ref_out, "-C", adaptor,
         "-N", "100000"],
        check=True, capture_output=True,
    )
    process_paired_end(ref_index, pe_fastq_clippable[0],
                       pe_fastq_clippable[1], my_out, adaptor=adaptor)
    for suf in ("", ".mapstats"):
        _cmp(ref_out + suf, my_out + suf, f"pe_clip{suf}")


def test_multi_file_shared_output_golden(work, ref_walt, ref_index, se_fastq):
    """Two SE read files, one -o: truncate once, append per run
    (walt.cpp:214-233); exercised through the CLI layer, which owns the
    truncation, against the reference binary doing the same."""
    from walt_tpu.cli import main_map
    from walt_tpu.genome import load_genome

    g = load_genome([str(work / "genome.fa")])
    rng = np.random.default_rng(31)
    second = work / "se_second.fq"
    write_fastq(second, simulate_reads(g, rng, 60, 80, name_prefix="b"))

    ref_out = str(work / "ref_se_multi.out")
    my_out = str(work / "my_se_multi.out")
    _clear(ref_out, my_out)
    subprocess.run(
        [ref_walt, "-i", ref_index, "-r", f"{se_fastq},{second}",
         "-o", ref_out, "-N", "100000"],
        check=True, capture_output=True,
    )
    rc = main_map(["-i", ref_index, "-r", f"{se_fastq},{second}",
                   "-o", my_out, "--backend", "numpy"])
    assert rc == 0
    for suf in ("", ".mapstats"):
        _cmp(ref_out + suf, my_out + suf, f"se_multi{suf}")
