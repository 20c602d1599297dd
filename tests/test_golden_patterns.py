"""Golden equivalence for seed patterns 5 and 7 vs reference binaries.

The reference ships three spaced-seed patterns selected at COMPILE time by
``-D SEEDPATTERN{3,5,7}`` (src/walt/Makefile:34, seedpattern.hpp:29-352);
FAQ.md:5-13 tells users to rebuild with pattern 7 for reads shorter than
38 bp.  The repo makes the pattern a runtime choice; these tests build the
reference twice more (patched Makefiles) and diff index bytes and mapping
output byte-for-byte under each alternative pattern, covering pattern 7's
``exit1_seed=4`` early-exit gate (mapping.cpp:255-262) and its 23 bp
minimum read length against the actual binaries.

Read lengths are kept inside the DEFINED-behavior range: the reference
indexes F2CAREDPOSITION[] by seed_len without a bounds check, so reads
long enough that ``repeats * CAREDWEIGHT > cared_size`` (pattern 5: >144 bp,
pattern 7: >146 bp) read past the table (undefined; see
walt_tpu/constants.py).  All reads here are <= 80 bp.

Short-read floor: ``getHashValue`` always packs cared positions 0..11 of
the SHIFTED read (util.hpp:175-182) with no bounds check, so a pattern-7
read of length L < cared[11] + shift + 1 = 18 + 6 + 1 = 25 makes the
reference read past ``read_seed.c_str()``'s NUL and die with
"[ERROR: NON-ACGT NUCLEOTIDE]" -- the reference binary CANNOT map its own
advertised 23 bp minimum (observed on the actual SEEDPATTERN7 build; our
runtime-pattern implementation maps 23-24 bp reads fine, a documented
divergence).  Golden reads therefore stay >= 25 bp (pattern 5's floor,
cared[11] + 4 + 1 = 32, equals its MINIMALREADLEN -- no gap).
"""

import filecmp
import os
import shutil
import subprocess

import pytest

from tests.conftest import REFERENCE, simulate_pairs, simulate_reads, write_fastq
from walt_tpu.constants import get_pattern


def _pattern_bins(n: str):
    """Reference walt+makedb built with -D SEEDPATTERN<n> (cached)."""
    build = f"/tmp/refbuild_p{n}"
    walt = os.path.join(build, "src", "walt", "walt")
    makedb = os.path.join(build, "src", "walt", "makedb")
    if not (os.path.isfile(walt) and os.path.isfile(makedb)):
        if not os.path.isdir(REFERENCE):
            return None
        shutil.copytree(REFERENCE, build, dirs_exist_ok=True)
        mk = os.path.join(build, "src", "walt", "Makefile")
        with open(mk) as f:
            txt = f.read()
        assert "SEEDPATTERN3" in txt
        with open(mk, "w") as f:
            f.write(txt.replace("SEEDPATTERN3", f"SEEDPATTERN{n}"))
        subprocess.run(["make", "all"], cwd=build, capture_output=True)
    if not (os.path.isfile(walt) and os.path.isfile(makedb)):
        return None
    return walt, makedb


@pytest.fixture(scope="module", params=["5", "7"])
def pat(request, work):
    bins = _pattern_bins(request.param)
    if bins is None:
        pytest.skip("reference binaries unavailable")
    walt, makedb = bins
    prefix = str(work / f"refp{request.param}.dbindex")
    if not os.path.exists(prefix):
        subprocess.run(
            [makedb, "-c", str(work / "genome.fa"), "-o", prefix],
            check=True, capture_output=True,
        )
    return request.param, walt, prefix


@pytest.fixture(scope="module")
def pat_se_fastq(pat, work):
    """Reads straddling the pattern's minimum length (the pattern-7 use
    case is short reads: FAQ.md:5-13)."""
    from walt_tpu.genome import load_genome

    name, _, _ = pat
    pattern = get_pattern(name)
    g = load_genome([str(work / "genome.fa")])
    rng = np.random.default_rng(int(name) * 977)
    recs = simulate_reads(g, rng, 120, 80)
    recs += simulate_reads(g, rng, 25, 30, name_prefix="short")
    # shortest length the REFERENCE can map without UB (see module doc)
    floor = max(pattern.min_read_len, int(pattern.cared[11]) +
                pattern.pattern_len)
    recs += simulate_reads(g, rng, 10, floor, name_prefix="mn")
    # below MINIMALREADLEN: counted too_short before any seed is touched
    recs += simulate_reads(g, rng, 10, max(8, pattern.min_read_len - 1),
                           name_prefix="sub")
    path = work / f"pat{name}_se.fq"
    write_fastq(path, recs)
    return str(path)


import numpy as np  # noqa: E402


def _cmp(a, b, label):
    assert os.path.exists(a) == os.path.exists(b), f"{label}: presence"
    if os.path.exists(a):
        assert filecmp.cmp(a, b, shallow=False), label


def test_pattern_index_bytes_identical(pat, work):
    """build_all_tables under the pattern == makedb -D SEEDPATTERN<n>."""
    from walt_tpu.index.build import build_all_tables
    from walt_tpu.index.io_walt import write_index

    name, _, ref_prefix = pat
    mine = str(work / f"myp{name}.dbindex")
    if not os.path.exists(mine):
        genome, tables = build_all_tables(
            [str(work / "genome.fa")], get_pattern(name), verbose=False
        )
        write_index(mine, genome, tables)
    for suf in ("", "_CT00", "_CT01", "_GA10", "_GA11"):
        assert filecmp.cmp(ref_prefix + suf, mine + suf, shallow=False), suf


@pytest.mark.parametrize("sam", [False, True], ids=["mr", "sam"])
def test_pattern_se_golden(pat, work, pat_se_fastq, sam):
    from walt_tpu.core.single_end import process_single_end

    name, walt, prefix = pat
    tag = f"p{name}_{'sam' if sam else 'mr'}"
    ref_out = str(work / f"ref_{tag}.out")
    my_out = str(work / f"my_{tag}.out")
    side = ("_ambiguous", "_unmapped")
    for out in (ref_out, my_out):
        for suf in ("", ".mapstats") + side:
            if os.path.exists(out + suf):
                os.remove(out + suf)
        open(out, "w").close()
        open(out + ".mapstats", "w").close()
    subprocess.run(
        [walt, "-i", prefix, "-r", pat_se_fastq, "-o", ref_out, "-a", "-u",
         "-N", "100000"] + (["-sam"] if sam else []),
        check=True, capture_output=True,
    )
    process_single_end(prefix, pat_se_fastq, my_out, ambiguous=True,
                       unmapped=True, sam=sam, pattern_name=name)
    for suf in ("", ".mapstats") + (() if sam else side):
        _cmp(ref_out + suf, my_out + suf, f"{tag}{suf}")


def test_pattern_pe_golden(pat, work):
    """Paired-end under the alternative pattern: per-mate heaps, the
    pattern-specific seed gate (paired.cpp:131-142), pair join."""
    from walt_tpu.genome import load_genome
    from walt_tpu.core.paired_end import process_paired_end

    name, walt, prefix = pat
    g = load_genome([str(work / "genome.fa")])
    rng = np.random.default_rng(int(name) * 3301)
    r1, r2 = simulate_pairs(g, rng, 80, 75)
    p1, p2 = work / f"pat{name}_pe1.fq", work / f"pat{name}_pe2.fq"
    write_fastq(p1, r1)
    write_fastq(p2, r2)
    ref_out = str(work / f"ref_p{name}_pe.out")
    my_out = str(work / f"my_p{name}_pe.out")
    for out in (ref_out, my_out):
        open(out, "w").close()
        open(out + ".mapstats", "w").close()
    subprocess.run(
        [walt, "-i", prefix, "-1", str(p1), "-2", str(p2), "-o", ref_out,
         "-N", "100000"],
        check=True, capture_output=True,
    )
    process_paired_end(prefix, str(p1), str(p2), my_out, pattern_name=name)
    for suf in ("", ".mapstats"):
        _cmp(ref_out + suf, my_out + suf, f"p{name}_pe{suf}")
