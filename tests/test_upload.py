"""Piecewise H2D upload and 1-D window-column gathers (round-3 additions)."""

import numpy as np


def test_upload_pieces_roundtrip():
    from walt_tpu.core.jax_backend import _upload_pieces

    arr = np.arange(100_003, dtype=np.uint32)
    # force many pieces, including the overlapping final piece
    dev = _upload_pieces(arr, "test", piece_bytes=4 * 7_001)
    assert np.array_equal(np.asarray(dev), arr)


def test_upload_pieces_small_passthrough():
    from walt_tpu.core.jax_backend import _upload_pieces

    arr = np.arange(64, dtype=np.uint32)
    dev = _upload_pieces(arr, "test")  # under the piece size: plain asarray
    assert np.array_equal(np.asarray(dev), arr)


def test_window_cols_matches_window_words():
    import jax.numpy as jnp

    from walt_tpu.ops import packing

    rng = np.random.default_rng(3)
    seq = rng.integers(0, 4, 5000).astype(np.uint8)
    pseq = jnp.asarray(packing.pack_genome_np(seq, tail_words=8))
    gpos = jnp.asarray(rng.integers(0, 4800, 257).astype(np.int32))
    ww = np.asarray(packing.window_words(pseq, gpos, 6))
    cols = [np.asarray(c) for c in packing.window_cols(pseq, gpos, 6)]
    for j in range(6):
        assert np.array_equal(cols[j], ww[:, j]), f"column {j}"
