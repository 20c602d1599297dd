"""PBAT (-P) extension: mate conversion roles swap.

The reference documents -P (README.md:100-104) but its code has no such
option (verified in SURVEY 2.5.11), so there is no golden binary to diff
against; instead: (1) the jax and numpy backends must agree byte-for-byte,
and (2) feeding a PBAT-protocol library (mates swapped relative to the
directional protocol) must recover the pairs that the directional run finds.
"""

import filecmp


def test_pbat_backends_agree_and_recover_pairs(work, my_index, pe_fastq):
    from walt_tpu.core.backends import get_backend
    from walt_tpu.core.paired_end import process_paired_end

    p1, p2 = pe_fastq
    outs = {}
    for backend_name in ("numpy", "jax"):
        out = str(work / f"pbat_{backend_name}.out")
        open(out, "w").close()
        open(out + ".mapstats", "w").close()
        # swapping the mate files makes the library PBAT-shaped
        stat = process_paired_end(
            my_index, p2, p1, out, backend=get_backend(backend_name),
            pbat=True,
        )
        outs[backend_name] = (out, stat)

    for suf in ("", ".mapstats"):
        assert filecmp.cmp(outs["numpy"][0] + suf, outs["jax"][0] + suf,
                           shallow=False), suf

    directional = str(work / "pbat_directional.out")
    open(directional, "w").close()
    open(directional + ".mapstats", "w").close()
    ref_stat = process_paired_end(
        my_index, p1, p2, directional, backend=get_backend("numpy"),
    )
    assert outs["numpy"][1].unique_pairs == ref_stat.unique_pairs
    assert outs["numpy"][1].unique_pairs > 0
