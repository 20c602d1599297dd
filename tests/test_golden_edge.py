"""Golden tests for index-build edge paths vs the reference binaries.

Covers the paths VERDICT round 1 flagged as implemented-but-unproven:

- >=500k bucket erasure (reference.cpp:211-218) exercised END-TO-END: an
  (AT)n megarepeat genome whose degenerate buckets cross the threshold,
  index diffed byte-for-byte, then reads over the erased repeat mapped and
  diffed;
- chromosome-boundary sort quirks: dozens of tiny chromosomes put many
  index entries within cared[-1] bases of a chromosome end, stressing the
  boundary-aware comparator (reference.cpp:258-288) and the device
  pipeline's flagged-bucket host fallback;
- directory input: the reference concatenates chromosome files in readdir
  order (smithlab_os.cpp:150-170, filesystem-dependent); waltx sorts
  (genome.py:72), a deliberate, documented divergence -- the test pins
  equality whenever readdir order happens to be sorted, and otherwise pins
  that the two genomes hold the same chromosome SET with ours sorted.
"""

import filecmp
import os
import subprocess

import numpy as np
import pytest

from tests.conftest import simulate_reads, write_fastq


def _build_both(tmp, fasta_args, ref_makedb):
    """Build reference + waltx indexes over the same chromosome input."""
    from walt_tpu.index.build import build_all_tables
    from walt_tpu.index.io_walt import write_index

    ref_idx = str(tmp / "ref.dbindex")
    my_idx = str(tmp / "my.dbindex")
    subprocess.run([ref_makedb, "-c", fasta_args, "-o", ref_idx],
                   check=True, capture_output=True)
    genome, tables = build_all_tables(
        [fasta_args] if os.path.isfile(fasta_args) else sorted(
            os.path.join(fasta_args, f) for f in os.listdir(fasta_args)
            if f.endswith(".fa")
        ),
        verbose=False,
    )
    write_index(my_idx, genome, tables)
    return ref_idx, my_idx


def _map_both(tmp, tag, ref_walt, ref_idx, my_idx, fastq, backend=None):
    from walt_tpu.core.single_end import process_single_end

    ref_out = str(tmp / f"ref_{tag}.out")
    my_out = str(tmp / f"my_{tag}.out")
    for p in (ref_out, my_out):
        open(p, "w").close()
        open(p + ".mapstats", "w").close()
    subprocess.run(
        [ref_walt, "-i", ref_idx, "-r", fastq, "-o", ref_out, "-N", "100000"],
        check=True, capture_output=True,
    )
    process_single_end(my_idx, fastq, my_out, backend=backend)
    for suf in ("", ".mapstats"):
        assert filecmp.cmp(ref_out + suf, my_out + suf, shallow=False), (
            f"{tag}{suf} differs"
        )


@pytest.fixture(scope="module")
def jax_backend():
    from walt_tpu.core.backends import get_backend

    return get_backend("jax")


def test_erased_bucket_golden(tmp_path, ref_makedb, ref_walt, jax_backend):
    """A >=500k bucket is erased at build time; index files AND the mapping
    of reads over the erased repeat stay byte-identical."""
    from walt_tpu.genome import load_genome

    rng = np.random.default_rng(99)
    bases = np.array(list("ACGT"))
    # 620k of (AT)n: every in-repeat seed position hashes to one of 2 keys,
    # each collecting ~310k > 500k/2 entries... make it 1.2M to be sure one
    # bucket crosses 500k in every conversion
    repeat = "AT" * 600_000
    flank = "".join(bases[rng.integers(0, 4, 60_000)])
    fasta = tmp_path / "erase.fa"
    with open(fasta, "w") as f:
        f.write(">chrE\n")
        seq = flank + repeat + flank
        for i in range(0, len(seq), 70):
            f.write(seq[i : i + 70] + "\n")

    ref_idx, my_idx = _build_both(tmp_path, str(fasta), ref_makedb)
    # the erasure actually fired: makedb printed the notice
    proc = subprocess.run(
        [ref_makedb, "-c", str(fasta), "-o", str(tmp_path / "notice.dbindex")],
        check=True, capture_output=True, text=True,
    )
    assert "ERASE THE BUCKET" in proc.stderr
    for suf in ("", "_CT00", "_CT01", "_GA10", "_GA11"):
        assert filecmp.cmp(ref_idx + suf, my_idx + suf, shallow=False), suf

    # reads straddling / inside the erased repeat plus normal flank reads
    g = load_genome([str(fasta)])
    recs = simulate_reads(g, rng, 60, 80, n_rate=0.0)
    at = ("AT" * 50)[:80]
    recs += [(f"rep{i}", at[i % 2:] + at[: i % 2], "I" * 80) for i in range(6)]
    fq = tmp_path / "erase.fq"
    write_fastq(fq, recs)
    _map_both(tmp_path, "erase", ref_walt, ref_idx, my_idx, str(fq),
              backend=jax_backend)


def test_many_tiny_chromosomes_golden(tmp_path, ref_makedb, ref_walt,
                                      jax_backend):
    """40 chromosomes of 180-500 bp: a large share of index entries sit
    within cared[-1] (=178) bases of a chromosome end, so the boundary
    comparator and the flagged-bucket device fallback both fire."""
    rng = np.random.default_rng(41)
    bases = np.array(list("ACGT"))
    fasta = tmp_path / "tiny.fa"
    with open(fasta, "w") as f:
        for c in range(40):
            n = int(rng.integers(180, 500))
            f.write(f">c{c:02d}\n")
            f.write("".join(bases[rng.integers(0, 4, n)]) + "\n")

    ref_idx, my_idx = _build_both(tmp_path, str(fasta), ref_makedb)
    for suf in ("", "_CT00", "_CT01", "_GA10", "_GA11"):
        assert filecmp.cmp(ref_idx + suf, my_idx + suf, shallow=False), suf

    from walt_tpu.genome import load_genome

    g = load_genome([str(fasta)])
    recs = simulate_reads(g, rng, 120, 60, n_rate=0.0)
    fq = tmp_path / "tiny.fq"
    write_fastq(fq, recs)
    _map_both(tmp_path, "tiny", ref_walt, ref_idx, my_idx, str(fq),
              backend=jax_backend)


def test_directory_input_golden(tmp_path, ref_makedb):
    """Directory input: pin the sorted-order decision vs readdir order."""
    from walt_tpu.genome import identify_chromosomes
    from walt_tpu.index.io_walt import read_head

    rng = np.random.default_rng(17)
    bases = np.array(list("ACGT"))
    d = tmp_path / "chroms"
    d.mkdir()
    names = ["zeta.fa", "alpha.fa", "mid.fa"]
    for nm in names:
        with open(d / nm, "w") as f:
            f.write(f">{nm[:-3]}\n")
            f.write("".join(bases[rng.integers(0, 4, 4000)]) + "\n")

    files = identify_chromosomes(str(d))
    assert files == sorted(files), "waltx dir scan must be sorted"

    ref_idx = str(tmp_path / "refdir.dbindex")
    subprocess.run([ref_makedb, "-c", str(d), "-o", ref_idx],
                   check=True, capture_output=True)
    ref_genome, _ = read_head(ref_idx)

    from walt_tpu.index.build import build_all_tables
    from walt_tpu.index.io_walt import write_index

    my_idx = str(tmp_path / "mydir.dbindex")
    genome, tables = build_all_tables(files, verbose=False)
    write_index(my_idx, genome, tables)
    my_genome, _ = read_head(my_idx)

    assert sorted(ref_genome.names) == sorted(my_genome.names)
    if list(ref_genome.names) == list(my_genome.names):
        # readdir order happened to be sorted: full byte equality holds
        for suf in ("", "_CT00", "_CT01", "_GA10", "_GA11"):
            assert filecmp.cmp(ref_idx + suf, my_idx + suf, shallow=False), suf
    else:
        # documented divergence (genome.py:72): waltx sorts for
        # filesystem-independent reproducibility; the reference's readdir
        # order is whatever the filesystem returns
        assert list(my_genome.names) == sorted(my_genome.names)
