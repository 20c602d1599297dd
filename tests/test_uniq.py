"""Word-0 run dedup (uniq) path: builder equivalence + mapping correctness.

The uniq structure (ops/device_index.build_uniq_device/build_uniq_host)
re-expresses each bucket's sorted entries as runs of equal first packed key
words; the pipeline's fast path then searches runs instead of entries
(ops/pipeline.map_strand_core uniq_* args).  These tests pin:

- device and host builders produce identical structures;
- the full_mask variant (every read compares a full word 0, e.g. >=86bp
  under pattern 3) matches the exact host enumerator -- the standard
  fixtures only carry <=80bp reads, which ride the masked-prefix variant;
- mixed batches straddling the full_mask boundary stay exact.
"""

import numpy as np
import pytest

from walt_tpu.constants import get_pattern
from walt_tpu.index import io_walt

from tests.conftest import simulate_reads, write_fastq


@pytest.fixture(scope="module")
def table(my_index):
    genome_meta, _ = io_walt.read_head(my_index)
    return io_walt.read_table(my_index + "_CT00", genome_meta)


def test_builders_agree(table):
    import jax.numpy as jnp

    from walt_tpu.core.refmap import padded_seq
    from walt_tpu.ops.device_index import (
        build_uniq_device, build_uniq_host, pack_key_words,
    )
    from walt_tpu.ops.packing import pack_genome_np

    g, ht = table
    pattern = get_pattern("3")
    w0 = pack_key_words(padded_seq(g, pattern), ht.index, pattern)[:, 0]
    h_uw, h_uo, h_uc, h_bits = build_uniq_host(w0, ht.counter)
    d_uw, d_uo, d_uc, d_bits = build_uniq_device(
        jnp.asarray(pack_genome_np(g.seq, tail_words=66)),
        jnp.asarray(ht.index), jnp.asarray(ht.counter), pattern,
        chunk=1 << 10,  # force many chunks + carry handling
    )
    assert h_bits == d_bits
    # the device builder returns CAPACITY arrays (single-pass, round 5):
    # the used prefix must equal the host's exact structure and every pad
    # slot past it must hold n (keeps uniq_off sorted for searchsorted)
    U = len(h_uw)
    assert np.array_equal(h_uw, np.asarray(d_uw)[:U])
    assert np.array_equal(h_uo, np.asarray(d_uo)[: U + 1])
    assert (np.asarray(d_uo)[U:] == len(ht.index)).all()
    assert np.array_equal(h_uc, np.asarray(d_uc))
    # structure sanity: runs tile the entry space, buckets tile the runs
    assert h_uo[0] == 0 and h_uo[-1] == len(ht.index)
    assert (np.diff(h_uo.astype(np.int64)) > 0).all()
    assert h_uc[0] == 0 and h_uc[-1] == len(h_uw)


def test_budget_capacity_band(table):
    """max_bytes between 8(U+1) and 8(n+1) still builds (the band the old
    exact two-pass design exploited); below 8(U+1) it returns None."""
    import jax.numpy as jnp

    from walt_tpu.core.refmap import padded_seq
    from walt_tpu.ops.device_index import (
        build_uniq_device, build_uniq_host, pack_key_words,
    )
    from walt_tpu.ops.packing import pack_genome_np

    g, ht = table
    pattern = get_pattern("3")
    w0 = pack_key_words(padded_seq(g, pattern), ht.index, pattern)[:, 0]
    h_uw, h_uo, h_uc, _ = build_uniq_host(w0, ht.counter)
    U, n = len(h_uw), len(ht.index)
    nbw4 = ((n + 31) >> 5) * 4
    args = (jnp.asarray(pack_genome_np(g.seq, tail_words=66)),
            jnp.asarray(ht.index), jnp.asarray(ht.counter), pattern)
    # fits exactly U runs (cap >= U): must build and match the host prefix
    got = build_uniq_device(*args, max_bytes=8 * (U + 2) + nbw4)
    assert got is not None
    assert np.array_equal(h_uw, np.asarray(got[0])[:U])
    # cannot fit U runs: must refuse (incomplete structures are discarded)
    assert build_uniq_device(*args, max_bytes=8 * (U - 5) + nbw4) is None


def _diff_vs_oracle(table, fastq, b=5000, max_mm=6, **backend_kw):
    from walt_tpu.core.backends import NumpyBackend
    from walt_tpu.core.jax_backend import JaxBackend
    from walt_tpu.host.fastq import FgetsLines, load_batch

    g, ht = table
    pattern = get_pattern("3")
    batch = load_batch(FgetsLines(fastq), 10**6)
    codes, lens = batch.packed()
    ref = NumpyBackend().map_strand(
        codes, lens, g, ht, False, b, max_mm, pattern
    )
    got = JaxBackend(**backend_kw).map_strand(
        codes, lens, g, ht, False, b, max_mm, pattern
    )
    as_tup = lambda s: [(int(x), int(y), int(z)) for x, y, z in s]
    bad = [i for i in range(len(ref)) if as_tup(ref[i]) != as_tup(got[i])]
    assert not bad, f"{len(bad)} reads diverge, first: {bad[:5]}"


@pytest.fixture(scope="module")
def long_fastq(work):
    """>=86bp reads: full word-0 masks, the uniq full_mask variant."""
    from walt_tpu.genome import load_genome

    g = load_genome([str(work / "genome.fa")])
    rng = np.random.default_rng(29)
    recs = simulate_reads(g, rng, 120, 100)
    path = work / "se_long.fq"
    write_fastq(path, recs)
    return str(path)


@pytest.fixture(scope="module")
def mixed_fastq(work):
    """Reads straddling the full_mask boundary in one batch."""
    from walt_tpu.genome import load_genome

    g = load_genome([str(work / "genome.fa")])
    rng = np.random.default_rng(31)
    recs = simulate_reads(g, rng, 60, 100)
    recs += simulate_reads(g, rng, 60, 80, name_prefix="m")
    recs += simulate_reads(g, rng, 20, 45, name_prefix="s")
    path = work / "se_mixed.fq"
    write_fastq(path, recs)
    return str(path)


def test_full_mask_variant_vs_oracle(table, long_fastq):
    from walt_tpu.core.jax_backend import JaxBackend

    pattern = get_pattern("3")
    assert JaxBackend._full_mask(np.full(8, 100, np.int32), pattern)
    _diff_vs_oracle(table, long_fastq)


def test_mixed_lengths_vs_oracle(table, mixed_fastq):
    from walt_tpu.core.jax_backend import JaxBackend

    pattern = get_pattern("3")
    # a chunk holding any partial-word0 read must take the two-probe path
    assert not JaxBackend._full_mask(
        np.asarray([100, 80], np.int32), pattern
    )
    _diff_vs_oracle(table, mixed_fastq)


def test_full_mask_helper(table):
    from walt_tpu.core.jax_backend import JaxBackend

    pattern = get_pattern("3")
    fm = JaxBackend._full_mask
    assert fm(np.asarray([86, 100, 200], np.int32), pattern)
    assert not fm(np.asarray([85], np.int32), pattern)
    # sub-minimum reads never map: they do not constrain the variant
    assert fm(np.asarray([0, 8, 100], np.int32), pattern)
    assert fm(np.asarray([0], np.int32), pattern)


def test_key16_vs_oracle_repetitive(tmp_path, monkeypatch):
    """16-bit prefix keys on a REPEAT-heavy genome (prefix collisions are
    common there) still reproduce the oracle byte-for-byte."""

    from walt_tpu.core.backends import NumpyBackend
    from walt_tpu.core.jax_backend import JaxBackend
    from walt_tpu.index.build import build_table
    from walt_tpu.ops import device_index
    from walt_tpu.synth import make_genome_repetitive, sample_reads

    genome = make_genome_repetitive(400_000, n_chroms=2, seed=17)
    pattern = get_pattern("3")
    g, ht = build_table(genome, "CT00", pattern, verbose=False)
    codes, lens, _ = sample_reads(genome, 2000, 100, seed=23)

    # force the key16 ladder rung: uniq over budget AND the u32 word0
    # build hitting a (simulated) device OOM -- which also exercises the
    # rung-degradation path added in round 4
    real = device_index.build_uniq_device
    monkeypatch.setattr(
        device_index, "build_uniq_device",
        lambda *a, **kw: real(*a, **dict(kw, max_bytes=8)),
    )
    def oom_kw(*a, **kw):
        raise RuntimeError("RESOURCE_EXHAUSTED: simulated")

    monkeypatch.setattr(device_index, "build_key_words_device", oom_kw)
    backend = JaxBackend(chunk=1024, small_chunk=1024)
    got = backend.map_strand(codes, lens, g, ht, False, 5000, 6, pattern)
    assert all(
        e[1]["key_words"].dtype.name == "uint16"
        for e in backend._tables.values()
    )
    ref = NumpyBackend().map_strand(codes, lens, g, ht, False, 5000, 6, pattern)
    as_tup = lambda s: [(int(x), int(y), int(z)) for x, y, z in s]  # noqa: E731
    bad = [i for i in range(len(ref)) if as_tup(ref[i]) != as_tup(got[i])]
    assert not bad, f"{len(bad)} reads diverge, first: {bad[:5]}"
