"""HBM capacity planning (round-2 verdict next #3): assert the hg19 plan."""

from walt_tpu.hbm_plan import plan_tables, table_bytes

G = 1 << 30


def test_bench_se_large_fits_one_chip_with_uniq():
    p = plan_tables(512_000_000, 2, uniq_ratio=0.93)
    assert p.tp == 1 and p.uniq
    assert p.fits()
    # measured round-3: base 2.10 GB/table, uniq 3.61 GB/table
    assert abs(p.per_table_base / G - 2.10) < 0.05
    assert abs(p.per_table_accel / G - 3.61) < 0.1


def test_bench_se_xl_768M_fits_one_chip_key16():
    p = plan_tables(768_000_000, 2, uniq_ratio=0.93)
    assert p.tp == 1 and not p.uniq  # uniq would blow the budget; key16 fits
    assert p.fits()
    assert abs(p.per_chip_bytes / G - 9.10) < 0.2


def test_one_gbp_needs_two_chips():
    """With the round-4 re-calibrated 4.25 GB reserve (11.83 GB resident
    thrashed intermittent OOM on the real v5e), 1 Gbp x 2 tables no longer
    squeezes onto one chip even with key16: the bench ceiling stays 768M
    and 1 Gbp deploys at tp=2 (where the uniq accel fits again)."""
    p = plan_tables(1_000_000_000, 2, uniq_ratio=0.93)
    assert p.tp == 2 and p.uniq
    assert p.fits()


def test_hg19_se_plan():
    """hg19 (3.1 Gbp) SE: tp=4, key16 prefix tables, ~10.1 GB/chip."""
    p = plan_tables(3_100_000_000, 2, uniq_ratio=0.93)
    assert p.tp == 4 and not p.uniq
    assert p.fits()
    assert abs(p.per_chip_bytes / G - 10.14) < 0.2
    base, _, kw16 = table_bytes(3_100_000_000)
    assert abs(base / G - 12.35) < 0.1      # pseq+counter+index+flags
    assert abs(kw16 / G - 5.77) < 0.1       # 2 bytes/entry key16 prefix


def test_hg19_pe_plan():
    """hg19 PE (4 resident tables): tp=8 with key16 prefix tables."""
    p = plan_tables(3_100_000_000, 4, uniq_ratio=0.93)
    assert p.tp == 8 and not p.uniq
    assert p.fits()


def test_small_b_needs_full_key_words():
    p = plan_tables(512_000_000, 2, uniq_ratio=0.93, b_small=True)
    assert p.key_words == 3
    assert p.tp >= 2  # 12 bytes/entry of extra key words exceed one chip
