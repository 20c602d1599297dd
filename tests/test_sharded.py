"""Multi-chip sharded pipeline vs the single-device pipeline (CPU mesh)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh8():
    import jax

    from walt_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(jax.devices()[:8], tp=2)


def test_sharded_matches_single_device(mesh8):
    import jax.numpy as jnp

    from walt_tpu.constants import get_pattern
    from walt_tpu.ops import pipeline
    from walt_tpu.ops.packing import pack_codes_np
    from walt_tpu.parallel import map_strand_sharded, shard_device_table
    from walt_tpu.synth import build_synthetic_table, sample_reads

    pattern = get_pattern("3")
    genome, conv_genome, table, dt = build_synthetic_table(120_000, seed=3)
    codes, lens, _ = sample_reads(genome, 64, 80, seed=5)
    B, L = 64, 96
    padded = np.zeros((B, L), dtype=np.uint8)
    padded[:, : codes.shape[1]] = codes
    padded = pack_codes_np(padded)

    ref = [
        np.asarray(x)
        for x in pipeline.map_strand_device(
            jnp.asarray(padded), jnp.asarray(lens), jnp.int32(5000),
            jnp.int32(6), jnp.asarray(dt.pseq), jnp.asarray(dt.counter),
            jnp.asarray(dt.index), jnp.asarray(dt.key_words),
            jnp.asarray(dt.start_index), jnp.asarray(dt.bucket_flagged),
            pattern_name="3", ag_wildcard=False,
            search_bits=dt.max_bucket_bits,
        )
    ]

    st = shard_device_table(dt, 2)
    got = [
        np.asarray(x)
        for x in map_strand_sharded(
            jnp.asarray(padded), jnp.asarray(lens), jnp.int32(5000),
            jnp.int32(6), jnp.asarray(st.key_base), jnp.asarray(st.counter),
            jnp.asarray(st.index), jnp.asarray(st.key_words),
            jnp.asarray(st.bucket_flagged), jnp.asarray(st.pseq),
            jnp.asarray(st.start_index), mesh=mesh8, pattern_name="3",
            ag_wildcard=False, search_bits=st.max_bucket_bits,
        )
    ]

    # same candidates in the same order for non-fallback reads
    ok = ~(ref[4] | got[4])
    assert ok.sum() >= B - 2
    np.testing.assert_array_equal(ref[3][ok], got[3][ok])
    for k in range(3):
        for i in np.flatnonzero(ok):
            c = int(ref[3][i])
            np.testing.assert_array_equal(ref[k][i, :c], got[k][i, :c])
    assert int(ref[3][ok].sum()) > 0


def test_sharded_key16_matches_single_device(mesh8):
    """key16-accel tp shards (the hg19 HBM rung, hbm_plan.plan_tables)
    produce the same candidate streams as the unsharded pipeline."""
    import jax.numpy as jnp

    from walt_tpu.constants import get_pattern
    from walt_tpu.ops import pipeline
    from walt_tpu.ops.packing import pack_codes_np
    from walt_tpu.parallel import map_strand_sharded, shard_device_table
    from walt_tpu.synth import build_synthetic_table, sample_reads

    genome, conv_genome, table, dt = build_synthetic_table(120_000, seed=3)
    codes, lens, _ = sample_reads(genome, 64, 80, seed=5)
    B, L = 64, 96
    padded = np.zeros((B, L), dtype=np.uint8)
    padded[:, : codes.shape[1]] = codes
    padded = pack_codes_np(padded)

    ref = [
        np.asarray(x)
        for x in pipeline.map_strand_device(
            jnp.asarray(padded), jnp.asarray(lens), jnp.int32(5000),
            jnp.int32(6), jnp.asarray(dt.pseq), jnp.asarray(dt.counter),
            jnp.asarray(dt.index), jnp.asarray(dt.key_words),
            jnp.asarray(dt.start_index), jnp.asarray(dt.bucket_flagged),
            pattern_name="3", ag_wildcard=False,
            search_bits=dt.max_bucket_bits,
        )
    ]

    st = shard_device_table(dt, 2, accel="key16")
    assert st.key_words.dtype == np.uint16 and st.key_words.ndim == 2
    assert st.uniq_bits == 0
    got = [
        np.asarray(x)
        for x in map_strand_sharded(
            jnp.asarray(padded), jnp.asarray(lens), jnp.int32(5000),
            jnp.int32(6), jnp.asarray(st.key_base), jnp.asarray(st.counter),
            jnp.asarray(st.index), jnp.asarray(st.key_words),
            jnp.asarray(st.bucket_flagged), jnp.asarray(st.pseq),
            jnp.asarray(st.start_index), mesh=mesh8, pattern_name="3",
            ag_wildcard=False, search_bits=st.max_bucket_bits,
        )
    ]
    ok = ~(ref[4] | got[4])
    assert ok.sum() >= B - 2
    np.testing.assert_array_equal(ref[3][ok], got[3][ok])
    for i in np.flatnonzero(ok):
        c = int(ref[3][i])
        for k in range(3):
            np.testing.assert_array_equal(ref[k][i, :c], got[k][i, :c])


def test_entry_limit_guard():
    """The int32 entry-index invariant is asserted, not assumed."""
    import pytest as _pytest

    from walt_tpu.ops import pipeline

    pipeline.check_entry_limit(2**31 - 1, "ok")
    with _pytest.raises(ValueError, match="2\\^31"):
        pipeline.check_entry_limit(2**31, "overflow")


def _run_se(index, fastq, out, backend, **kw):
    from walt_tpu.core.single_end import process_single_end

    open(out, "w").close()
    open(out + ".mapstats", "w").close()
    process_single_end(index, fastq, out, backend=backend, **kw)
    return open(out, "rb").read(), open(out + ".mapstats", "rb").read()


def test_mesh_backend_se_end_to_end(mesh8, my_index, se_fastq, tmp_path):
    """The production JaxBackend on a dp=4 x tp=2 mesh writes the same bytes
    as the single-device backend (itself golden-tested vs the reference)."""
    from walt_tpu.core.jax_backend import JaxBackend

    single = _run_se(my_index, se_fastq, str(tmp_path / "s.mr"), JaxBackend(),
                     batch_size=64, ambiguous=True, unmapped=True)
    mesh = _run_se(my_index, se_fastq, str(tmp_path / "m.mr"),
                   JaxBackend(mesh=mesh8), batch_size=64, ambiguous=True,
                   unmapped=True)
    assert single == mesh
    for suf in ("_ambiguous", "_unmapped"):
        assert (tmp_path / ("s.mr" + suf)).read_bytes() == (
            tmp_path / ("m.mr" + suf)
        ).read_bytes()


def test_mesh_backend_pe_end_to_end(mesh8, my_index, pe_fastq, tmp_path):
    from walt_tpu.core.jax_backend import JaxBackend
    from walt_tpu.core.paired_end import process_paired_end

    outs = []
    for tag, backend in (("s", JaxBackend()), ("m", JaxBackend(mesh=mesh8))):
        out = str(tmp_path / f"{tag}.mr")
        open(out, "w").close()
        open(out + ".mapstats", "w").close()
        process_paired_end(my_index, pe_fastq[0], pe_fastq[1], out,
                           batch_size=64, sam=True, backend=backend)
        outs.append((open(out, "rb").read(),
                     open(out + ".mapstats", "rb").read()))
    assert outs[0] == outs[1]


def test_host_threads_se_identical(my_index, se_fastq, tmp_path):
    """-t threads: the threaded fallback/oracle path is byte-identical."""
    from walt_tpu.core.backends import get_backend
    from walt_tpu.host import replay

    one = _run_se(my_index, se_fastq, str(tmp_path / "t1.mr"),
                  get_backend("numpy"), batch_size=64)
    replay.set_host_threads(4)
    try:
        four = _run_se(my_index, se_fastq, str(tmp_path / "t4.mr"),
                       get_backend("numpy"), batch_size=64)
    finally:
        replay.set_host_threads(1)
    assert one == four


def test_shard_device_table_roundtrip():
    from walt_tpu.parallel import shard_device_table
    from walt_tpu.synth import build_synthetic_table

    _, _, table, dt = build_synthetic_table(60_000, seed=1)
    st = shard_device_table(dt, 4)
    nb = dt.counter.shape[0] - 1
    assert st.counter.shape == (4, nb // 4 + 1)
    # every entry is preserved exactly once, in order
    rebuilt = []
    for s in range(4):
        n = int(st.counter[s][-1])
        rebuilt.append(st.index[s][:n])
    np.testing.assert_array_equal(np.concatenate(rebuilt), dt.index)


def test_pe_mate_sharded_matches_single_device(mesh8):
    """The fused PE mate program (map_mate_sharded) through the production
    backend decode equals the single-device backend's slab streams."""
    from walt_tpu.constants import get_pattern
    from walt_tpu.core.jax_backend import JaxBackend
    from walt_tpu.index.build import build_table
    from walt_tpu.synth import make_genome, sample_reads

    pattern = get_pattern("3")
    genome = make_genome(120_000, n_chroms=2, seed=9)
    tables = [build_table(genome, conv, pattern, verbose=False)
              for conv in ("GA10", "GA11")]
    codes, lens, _ = sample_reads(genome, 64, 80, seed=11)

    sharded = JaxBackend(mesh=mesh8)
    single = JaxBackend()
    st, fb = sharded.map_mate_slabs(codes, lens, tables, True, 5000, 6,
                                    pattern)
    ss, sfb = single.map_mate_slabs(codes, lens, tables, True, 5000, 6,
                                    pattern)
    ok = ~(fb | sfb)
    assert ok.sum() >= len(lens) - 2
    for a, b in zip(st, ss):
        assert np.array_equal(a["cnt"][ok], b["cnt"][ok])
        for k in ("seed", "pos", "mm"):
            assert np.array_equal(a[k][ok], b[k][ok]), k
