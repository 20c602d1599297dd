"""Golden equivalence: byte-identical outputs vs the reference binaries."""

import filecmp
import os
import subprocess

import pytest


def _clear(out, extra=()):
    for suf in ("", ".mapstats") + tuple(extra):
        p = out + suf
        if os.path.exists(p):
            os.remove(p)
    open(out, "w").close()
    open(out + ".mapstats", "w").close()


def _ref_N(flags):
    """Shrink the reference's -N batch preallocation (default 10M).

    ProcessPairedEndReads/ProcessSingledEndReads preallocate O(N) strings and
    heaps up front (paired.cpp:598-607); with the 10M default that is minutes
    of page-fault time per invocation on this host.  All test inputs are far
    below 100k reads, so the output is identical.
    """
    return flags if "-N" in flags else ["-N", "100000"] + flags


def _cmp(a, b, label):
    assert os.path.exists(a) and os.path.exists(b), f"{label}: missing output"
    if not filecmp.cmp(a, b, shallow=False):
        la = open(a, errors="replace").readlines()
        lb = open(b, errors="replace").readlines()
        for i, (x, y) in enumerate(zip(la, lb)):
            assert x == y, f"{label}: first diff at line {i}:\nref: {x}\nmine: {y}"
        assert len(la) == len(lb), f"{label}: line count {len(la)} vs {len(lb)}"


def test_index_bytes_identical(work, my_index, ref_index):
    for suf in ("", "_CT00", "_CT01", "_GA10", "_GA11"):
        assert filecmp.cmp(ref_index + suf, my_index + suf, shallow=False), suf


SE_MODES = [
    pytest.param([], {}, id="mr"),
    pytest.param(["-sam"], {"sam": True}, id="sam"),
    pytest.param(["-A"], {"ag_wildcard": True}, id="ag-wildcard"),
    pytest.param(["-m", "3"], {"max_mismatches": 3}, id="m3"),
    pytest.param(["-b", "10"], {"b": 10}, id="bucket-cap"),
    pytest.param(["-N", "64"], {"batch_size": 64}, id="batched"),
]


@pytest.mark.parametrize("flags,kwargs", SE_MODES)
def test_single_end_golden(work, ref_walt, ref_index, se_fastq, flags, kwargs):
    from walt_tpu.core.single_end import process_single_end

    tag = "-".join(flags) or "default"
    ref_out = str(work / f"ref_se_{tag}.out")
    my_out = str(work / f"my_se_{tag}.out")
    side = ("_ambiguous", "_unmapped")
    _clear(ref_out, side)
    _clear(my_out, side)
    subprocess.run(
        [ref_walt, "-i", ref_index, "-r", se_fastq, "-o", ref_out, "-a", "-u"]
        + _ref_N(flags),
        check=True, capture_output=True,
    )
    process_single_end(
        ref_index, se_fastq, my_out, ambiguous=True, unmapped=True, **kwargs
    )
    for suf in ("", ".mapstats") + (side if "sam" not in kwargs else ()):
        if os.path.exists(ref_out + suf) or os.path.exists(my_out + suf):
            _cmp(ref_out + suf, my_out + suf, f"se{suf} {tag}")


PE_MODES = [
    pytest.param([], {}, id="mr"),
    pytest.param(["-sam"], {"sam": True}, id="sam"),
    pytest.param(["-k", "5"], {"top_k": 5}, id="topk5"),
    pytest.param(["-L", "200"], {"frag_range": 200}, id="fraglen200"),
]


@pytest.mark.parametrize("flags,kwargs", PE_MODES)
def test_paired_end_golden(work, ref_walt, ref_index, pe_fastq, flags, kwargs):
    from walt_tpu.core.paired_end import process_paired_end

    tag = "-".join(flags) or "default"
    ref_out = str(work / f"ref_pe_{tag}.out")
    my_out = str(work / f"my_pe_{tag}.out")
    side = ("_1_ambiguous", "_1_unmapped", "_2_ambiguous", "_2_unmapped")
    _clear(ref_out, side)
    _clear(my_out, side)
    subprocess.run(
        [ref_walt, "-i", ref_index, "-1", pe_fastq[0], "-2", pe_fastq[1],
         "-o", ref_out, "-a", "-u"] + _ref_N(flags),
        check=True, capture_output=True,
    )
    process_paired_end(
        ref_index, pe_fastq[0], pe_fastq[1], my_out,
        ambiguous=True, unmapped=True, **kwargs,
    )
    for suf in ("", ".mapstats") + (side if "sam" not in kwargs else ()):
        if os.path.exists(ref_out + suf) or os.path.exists(my_out + suf):
            _cmp(ref_out + suf, my_out + suf, f"pe{suf} {tag}")


def test_adaptor_clipping_golden(work, ref_walt, ref_index, se_fastq_clippable):
    from walt_tpu.core.single_end import process_single_end

    adaptor = "AGATCGGAAGAGC"
    ref_out = str(work / "ref_se_clip.out")
    my_out = str(work / "my_se_clip.out")
    _clear(ref_out)
    _clear(my_out)
    subprocess.run(
        [ref_walt, "-i", ref_index, "-r", se_fastq_clippable, "-o", ref_out,
         "-C", adaptor, "-N", "100000"],
        check=True, capture_output=True,
    )
    process_single_end(ref_index, se_fastq_clippable, my_out, adaptor=adaptor)
    for suf in ("", ".mapstats"):
        _cmp(ref_out + suf, my_out + suf, f"clip{suf}")
