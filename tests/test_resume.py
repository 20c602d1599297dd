"""Batch-granular checkpoint/resume: interrupted runs finish byte-identical.

The reference has no resume (outputs are truncated at startup,
walt.cpp:229-233); waltx adds it as an extension (walt_tpu.host.resume).
"""

import json
import os

from walt_tpu.cli import main_map
from walt_tpu.core.single_end import process_single_end


def _read(path):
    with open(path, "rb") as f:
        return f.read()


def test_se_resume_after_kill(tmp_path, my_index, se_fastq):
    # oracle: one uninterrupted run
    full = str(tmp_path / "full.mr")
    main_map(["-i", my_index, "-r", se_fastq, "-o", full, "-N", "40",
              "--backend", "numpy", "-a", "-u"])

    # interrupted run: small batches, kill by raising inside batch 3's emit
    out = str(tmp_path / "part.mr")
    calls = {"n": 0}
    import walt_tpu.core.single_end as se_mod

    orig = se_mod.emit.single_mr

    def dying_emit(*a, **k):
        calls["n"] += 1
        if calls["n"] > 95:  # inside the 3rd 40-read batch
            raise KeyboardInterrupt
        return orig(*a, **k)

    se_mod.emit.single_mr = dying_emit
    try:
        try:
            process_single_end(my_index, se_fastq, out, batch_size=40,
                               ambiguous=True, unmapped=True, resume=True)
            raise AssertionError("expected the simulated kill")
        except KeyboardInterrupt:
            pass
    finally:
        se_mod.emit.single_mr = orig

    ck = json.load(open(out + ".waltx_ckpt"))
    assert ck["reads_done"] == 80 and not ck["done"]
    # torn third batch is present on disk but past the recorded sizes
    assert os.path.getsize(out) >= ck["sizes"][out]

    # resume and compare everything byte-for-byte
    main_map(["-i", my_index, "-r", se_fastq, "-o", out, "-N", "40",
              "--backend", "numpy", "-a", "-u", "--resume"])
    for suf in ("", "_ambiguous", "_unmapped", ".mapstats"):
        assert _read(out + suf) == _read(full + suf), suf
    assert json.load(open(out + ".waltx_ckpt"))["done"]

    # re-invocation of a finished run is a no-op that keeps the output
    before = _read(out)
    main_map(["-i", my_index, "-r", se_fastq, "-o", out, "-N", "40",
              "--backend", "numpy", "-a", "-u", "--resume"])
    assert _read(out) == before


def test_pe_resume_after_kill(tmp_path, my_index, pe_fastq):
    from walt_tpu.core.paired_end import process_paired_end

    f1, f2 = pe_fastq
    full = str(tmp_path / "full.mr")
    main_map(["-i", my_index, "-1", f1, "-2", f2, "-o", full, "-N", "50",
              "--backend", "numpy"])

    out = str(tmp_path / "part.mr")
    import walt_tpu.core.paired_end as pe_mod

    orig = pe_mod.merge_pair
    calls = {"n": 0}

    def dying_merge(*a, **k):
        calls["n"] += 1
        if calls["n"] > 60:  # inside the 2nd 50-pair batch
            raise KeyboardInterrupt
        return orig(*a, **k)

    pe_mod.merge_pair = dying_merge
    try:
        try:
            process_paired_end(my_index, f1, f2, out, batch_size=50,
                               resume=True)
            raise AssertionError("expected the simulated kill")
        except KeyboardInterrupt:
            pass
    finally:
        pe_mod.merge_pair = orig

    ck = json.load(open(out + ".waltx_ckpt"))
    assert ck["reads_done"] == 50 and not ck["done"]

    main_map(["-i", my_index, "-1", f1, "-2", f2, "-o", out, "-N", "50",
              "--backend", "numpy", "--resume"])
    for suf in ("", ".mapstats"):
        assert _read(out + suf) == _read(full + suf), suf


def test_resume_fresh_run_truncates_stale_output(tmp_path, my_index, se_fastq):
    out = str(tmp_path / "o.mr")
    with open(out, "w") as f:
        f.write("stale junk\n")
    full = str(tmp_path / "full.mr")
    main_map(["-i", my_index, "-r", se_fastq, "-o", full,
              "--backend", "numpy"])
    main_map(["-i", my_index, "-r", se_fastq, "-o", out,
              "--backend", "numpy", "--resume"])
    assert _read(out) == _read(full)
