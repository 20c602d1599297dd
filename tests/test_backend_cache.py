"""Device-table cache lifetime: id()-keyed entries must pin their objects.

Round-2 verdict weak #7: the cache key is (id(genome), id(table), pattern);
CPython reuses addresses after GC, so a dropped-and-reloaded genome could
silently hit a stale entry unless the cache holds strong references.
"""

import gc
import weakref


def _load(my_index):
    from walt_tpu.index.io_walt import read_head, read_table

    header, _ = read_head(my_index)
    return read_table(my_index + "_CT00", header)


def test_cache_pins_genome_and_table(my_index):
    from walt_tpu.constants import get_pattern
    from walt_tpu.core.jax_backend import JaxBackend

    backend = JaxBackend(chunk=256, small_chunk=256)
    pattern = get_pattern("3")

    g, ht = _load(my_index)
    backend._device_table(g, ht, pattern)
    wg, wt = weakref.ref(g), weakref.ref(ht)
    del g, ht
    gc.collect()
    # the cache keeps both alive: their ids cannot be reused while cached
    assert wg() is not None and wt() is not None

    backend.free_tables()
    gc.collect()
    assert wg() is None and wt() is None


def test_cache_rebuilds_after_free(my_index):
    from walt_tpu.constants import get_pattern
    from walt_tpu.core.jax_backend import JaxBackend

    backend = JaxBackend(chunk=256, small_chunk=256)
    pattern = get_pattern("3")

    g1, t1 = _load(my_index)
    dt1, _ = backend._device_table(g1, t1, pattern)
    backend.free_tables()
    del g1, t1
    gc.collect()

    g2, t2 = _load(my_index)
    dt2, _ = backend._device_table(g2, t2, pattern)
    assert dt2 is not dt1
    assert (dt2.index == t2.index).all()
