"""Pallas verify kernel vs the jnp formulation (interpret mode on CPU)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from walt_tpu.constants import get_pattern  # noqa: E402
from walt_tpu.ops import pallas_verify, pipeline  # noqa: E402


def _random_inputs(rng, M, W):
    slices = rng.integers(0, 1 << 32, (M, W + 1), dtype=np.uint32)
    shift = (rng.integers(0, 16, (M,)) * 2).astype(np.uint32)
    conv = rng.integers(0, 1 << 32, (M, W), dtype=np.uint32)
    lane = np.zeros((M, W), dtype=np.uint32)
    for b in range(M):
        nl = rng.integers(1, W * 16 + 1)
        for w in range(W):
            nv = int(np.clip(nl - 16 * w, 0, 16))
            if nv:
                lane[b, w] = (0x55555555 << (2 * (16 - nv))) & 0xFFFFFFFF
    return tuple(map(jnp.asarray, (slices, shift, conv, lane)))


@pytest.mark.parametrize("M,W", [(384, 7), (5, 3), (64, 13)])
def test_kernel_matches_reference(M, W):
    rng = np.random.default_rng(42 + M)
    args = _random_inputs(rng, M, W)
    mm_k, win_k = pallas_verify.verify_flat(*args, W=W, interpret=True)
    mm_r, win_r = pallas_verify.verify_flat_reference(*args, W=W)
    np.testing.assert_array_equal(np.asarray(mm_k), np.asarray(mm_r))
    np.testing.assert_array_equal(np.asarray(win_k), np.asarray(win_r))


def test_pipeline_pallas_matches_xla(my_index):
    """map_strand_core with WALTX_PALLAS=1 == the XLA path, end to end."""
    from walt_tpu.core.backends import get_backend
    from walt_tpu.index import io_walt
    from walt_tpu.ops import packing, se_fold
    from walt_tpu.ops.device_index import (
        build_device_table, build_key_words_device,
    )

    pattern = get_pattern("3")
    gm, _ = io_walt.read_head(my_index)
    g, ht = io_walt.read_table_cached(my_index + "_CT00", gm)
    dt = build_device_table(g, ht, pattern)
    dev = dict(
        pseq=jnp.asarray(dt.pseq), counter=jnp.asarray(dt.counter),
        index=jnp.asarray(dt.index), start_index=jnp.asarray(dt.start_index),
        bucket_flagged=jnp.asarray(dt.bucket_flagged),
    )
    dev["key_words"] = build_key_words_device(dev["pseq"], dt.index, pattern)

    rng = np.random.default_rng(3)
    B, L = 32, 64
    starts = rng.integers(0, g.length_of_genome - L, B)
    codes = np.stack([np.asarray(g.seq[s:s + L]) for s in starts])
    lens = np.full(B, L, dtype=np.int32)
    preads = jnp.asarray(packing.pack_codes_np(codes))
    lens_d = jnp.asarray(lens)

    outs = {}
    for flag in ("0", "1"):
        os.environ["WALTX_PALLAS"] = flag
        try:
            # untraced core: the flag is read at trace time, so the jitted
            # wrapper's cache must be bypassed for the toggle to matter
            outs[flag] = pipeline.map_strand_core(
                preads, lens_d, jnp.int32(5000), jnp.int32(6), dev["pseq"],
                dev["counter"], dev["index"], dev["key_words"],
                dev["start_index"], dev["bucket_flagged"],
                pattern_name="3", ag_wildcard=False,
                search_bits=dt.max_bucket_bits,
            )
        finally:
            os.environ.pop("WALTX_PALLAS", None)
    for a, b in zip(outs["0"], outs["1"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
