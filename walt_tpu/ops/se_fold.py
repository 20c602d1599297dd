"""Device-side single-end best-hit fold + the fused SE mapping step.

Folds the candidate slabs of both strand tables into per-read BestMatch
state entirely on device, so one chunk costs one tiny host fetch
((B,)-shaped results) instead of shipping candidate slabs over PCIe/tunnel.

The fold is the jnp port of walt_tpu.host.replay_vec (itself the vectorized
form of the sequential BestMatch state machine, mapping.cpp:224-316 with
the seed early-exit gate of mapping.cpp:248-263): identical arithmetic,
identical ``times`` / stored-position / strand semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from walt_tpu.constants import get_pattern
from walt_tpu.ops import pipeline

#: improvement-reset anchor: never equals a real genome position (the
#: reference caps genomes at uint32 positions and a chromosome end strictly
#: below 2^32 - 1)
_FRESH = jnp.uint32(0xFFFFFFFF)


def se_fold(slabs, max_mm, pattern):
    """Fold [(cand_seed, cand_pos, cand_mm)] ('+' then '-') to BestMatch.

    Returns (pos (B,) uint32, times (B,) int32, minus (B,) bool,
    mismatch (B,) int32).
    """
    B, C = slabs[0][0].shape
    best = jnp.broadcast_to(jnp.asarray(max_mm, jnp.int32), (B,))
    times = jnp.zeros(B, dtype=jnp.int32)
    stored = jnp.zeros(B, dtype=jnp.uint32)  # BestMatch() starts at position 0
    minus = jnp.zeros(B, dtype=bool)
    big = jnp.int32(1 << 30)

    def shift_right(x, d):
        return jnp.pad(x, ((0, 0), (d, 0)))[:, :C]

    for strand_idx, (cand_seed, cand_pos, cand_mm) in enumerate(slabs):
        seed32 = cand_seed.astype(jnp.int32)
        for seed in range(pattern.pattern_len):
            mask = seed32 == seed
            seg_mm = jnp.where(mask, cand_mm, big)
            seg_min = seg_mm.min(axis=1)
            allowed = ~((best == 0) & (seed > 0)) & ~(
                (best == 1) & (seed >= pattern.exit1_seed)
            )
            improve = allowed & (seg_min < best)
            equal = allowed & (seg_min == best)
            active = improve | equal
            new_best = jnp.where(improve, seg_min, best)
            contrib = mask & (cand_mm == new_best[:, None]) & active[:, None]

            # last contributing position at-or-before each slot, by log-shift
            # propagation: gather-free (TPU gathers run ~7ns/elem; these are
            # pure vector selects)
            v = jnp.where(contrib, cand_pos, jnp.uint32(0))
            h = contrib
            d = 1
            while d < C:
                v = jnp.where(h, v, shift_right(v, d))
                h = h | shift_right(h, d)
                d *= 2
            anchor = jnp.where(improve, _FRESH, stored)
            prev_pos = jnp.where(
                shift_right(h, 1), shift_right(v, 1), anchor[:, None]
            )
            trans = contrib & (cand_pos != prev_pos)
            tdelta = trans.sum(axis=1, dtype=jnp.int32)
            has = h[:, -1]
            last_pos = v[:, -1]

            upd = active & has
            times = jnp.where(upd, jnp.where(improve, tdelta, times + tdelta), times)
            stored = jnp.where(upd, last_pos, stored)
            minus = jnp.where(active & (tdelta > 0), strand_idx == 1, minus)
            best = jnp.where(active, new_best, best)

    return stored, times, minus, best


@functools.partial(
    jax.jit,
    static_argnames=(
        "pattern_name", "ag_wildcard", "search_bits", "verify_slab",
        "cand_slab", "seeds", "wl_factor", "exact_b", "uniq_bits",
        "full_mask",
    ),
)
def map_single_end_device(preads, lens, b, max_mm, tables, *,
                          pattern_name: str, ag_wildcard: bool,
                          search_bits: tuple,
                          verify_slab: int = pipeline.VERIFY_SLAB,
                          cand_slab: int = pipeline.CAND_SLAB,
                          seeds: tuple | None = None,
                          wl_factor: int = pipeline.WL_FACTOR,
                          exact_b: bool = False,
                          uniq_bits: tuple = (0, 0),
                          full_mask: bool = False):
    """Full SE mapping step: both strand tables -> per-read BestMatch.

    ``tables``: tuple of two dicts (keys: pseq, counter, index, key_words,
    start_index, bucket_flagged), '+' table first (mapping.cpp:491-499 file
    order).  Returns ONE (B, 3) uint32 array -- [pos, times,
    (mm << 2) | (minus << 1) | fallback] -- so a chunk's result costs a
    single host fetch over the (high-latency) device tunnel; unpack with
    :func:`unpack_se_result`.
    """
    pattern = get_pattern(pattern_name)
    slabs = []
    fallback = None
    for t, bits, ubits in zip(tables, search_bits, uniq_bits):
        cs, cp, cm, _, fb = pipeline.map_strand_core(
            preads, lens, b, max_mm, t["pseq"], t["counter"], t["index"],
            t["key_words"], t["start_index"], t["bucket_flagged"],
            pattern_name=pattern_name, ag_wildcard=ag_wildcard,
            search_bits=bits, verify_slab=verify_slab, cand_slab=cand_slab,
            seeds=seeds, wl_factor=wl_factor, exact_b=exact_b,
            uniq_words=t.get("uniq_words"), uniq_off=t.get("uniq_off"),
            uniq_counter=t.get("uniq_counter"), uniq_bits=ubits,
            full_mask=full_mask,
        )
        slabs.append((cs, cp, cm))
        fallback = fb if fallback is None else (fallback | fb)
    pos, times, minus, mm = se_fold(slabs, max_mm, pattern)
    flags = (
        (mm.astype(jnp.uint32) << 2)
        | (minus.astype(jnp.uint32) << 1)
        | fallback.astype(jnp.uint32)
    )
    return jnp.stack([pos, times.astype(jnp.uint32), flags], axis=1)


def unpack_se_result(packed: "np.ndarray"):
    """(B, 3) uint32 -> (pos u32, times i32, minus bool, mm i32, fb bool)."""
    pos = packed[:, 0]
    times = packed[:, 1].astype("int32")
    flags = packed[:, 2]
    minus = (flags & 2).astype(bool)
    fb = (flags & 1).astype(bool)
    mm = (flags >> 2).astype("int32")
    return pos, times, minus, mm, fb
