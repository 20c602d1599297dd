"""Pallas TPU kernel for the candidate-verify hot op.

The verify stage (the reference's per-base mismatch loop,
src/walt/mapping.cpp:288-304, restructured in ops/pipeline.py) is, per
worklist candidate: align a (W+1)-word raw genome slice to the candidate's
bit offset, XOR against the converted read, OR-fold each 2-bit lane, and
popcount under the read-length mask (-> mismatch count).  Refinement
membership is decided from the packed lookup keys *before* the worklist is
built (ops/pipeline.map_strand_core), so this kernel only ever sees real
candidates (typically 1-2 per read), not full slabs.

Layout (round 5, chip-learned): the worklist row count M is the LANE
dimension.  The first formulation blocked on (TM, W) tiles with W <= 8 as
the minor axis; TPU tiles pad the minor axis to 128 lanes, so every VMEM
block carried 16-18x padding and the kernel VMEM-OOMed at production
shapes (scoped 19.8 M > 16 M at TM=4096).  With (W, TM) blocks -- words
major, rows minor -- blocks are dense, VMEM holds kilobyte-true tiles, and
the vector ops run at full lane occupancy.  The caller gathers the genome
slices directly in (W+1, M) form (same HBM bytes, transposed index
arithmetic) and transposes the tiny read/lane arrays in XLA.

Enabled with WALTX_PALLAS=1 (see ops/pipeline.py); correctness is tested
in interpreter mode on CPU (tests/test_pallas.py) against the jnp
formulation, and the on-chip A/B lives in DEVPROF.json.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

#: worklist rows per grid step (the LANE axis of each (W, TILE_ROWS) block)
TILE_ROWS = 2048


def _verify_kernel(slices_ref, shift_ref, conv_ref, lane_ref,
                   mm_ref, win_ref, *, W: int):
    """One (W, TM) tile: align + compare + fold + count.

    slices: (W+1, TM) u32 raw genome words, word j of row m at [j, m]
    shift:  (1, TM) u32, 2 * (gpos & 15)
    conv:   (W, TM) u32 converted read words
    lane:   (W, TM) u32 read-length lane masks
    mm:     (1, TM) i32 mismatching-lane count over the masked window
    win:    (W, TM) u32 the aligned window (for verify_skip corrections)
    """
    sh = shift_ref[:, :]  # (1, TM)
    lo = jax.lax.slice_in_dim(slices_ref[:, :], 0, W, axis=0)
    hi = jax.lax.slice_in_dim(slices_ref[:, :], 1, W + 1, axis=0)
    # funnel-align; (hi >> (31 - sh)) >> 1 guards the undefined >>32
    win = jnp.where(
        sh == 0, lo, (lo << sh) | ((hi >> (jnp.uint32(31) - sh)) >> 1)
    )
    win_ref[:, :] = win
    d = win ^ conv_ref[:, :]
    fold = d | (d >> 1)
    mm_ref[:, :] = jnp.sum(
        jax.lax.population_count(fold & lane_ref[:, :]),
        axis=0, keepdims=True, dtype=jnp.int32,
    )


@functools.partial(jax.jit, static_argnames=("W", "interpret", "tile"))
def verify_windows(pseq, gpos, conv, lane, *, W: int,
                   interpret: bool = False, tile: int = TILE_ROWS):
    """Gather + fused verify over a worklist of genome positions.

    pseq: (Wg,) packed genome words; gpos: (M,) uint32 window start
    positions; conv/lane: (M, W) uint32 read words / length masks.
    Returns (mm (M,) int32, win (M, W) uint32); semantics match the jnp
    chain in ops/pipeline.map_strand_core (window_words/fold/popcount).

    The slice gather runs in XLA directly into the kernel's (W+1, M)
    layout; the kernel fuses align/compare/fold/count in VMEM.
    """
    M = gpos.shape[0]
    word0 = (gpos >> 4).astype(jnp.int32)
    sh = ((gpos & 15) << 1).astype(jnp.uint32)
    # (W+1, M) gather: word j of row m = pseq[word0[m] + j]
    widx = word0[None, :] + jnp.arange(W + 1, dtype=jnp.int32)[:, None]
    slices = jnp.take(pseq, widx, mode="clip")
    mm, win = verify_flat(slices, sh, conv.T, lane.T, W=W,
                          interpret=interpret, tile=tile, transposed=True)
    return mm, win.T


@functools.partial(jax.jit,
                   static_argnames=("W", "interpret", "tile", "transposed"))
def verify_flat(slices, shift, conv, lane, *, W: int,
                interpret: bool = False, tile: int = TILE_ROWS,
                transposed: bool = False):
    """Fused verify over a pre-gathered worklist.

    ``transposed=False`` (compat shape): slices (M, W+1), conv/lane (M, W);
    returns (mm (M,), win (M, W)).  ``transposed=True``: slices (W+1, M),
    conv/lane (W, M); returns (mm (M,), win (W, M)) -- the layout the
    kernel actually runs, with M on the 128-lane axis (see module
    docstring).
    """
    if not transposed:
        mm, win = verify_flat(slices.T, shift, conv.T, lane.T, W=W,
                              interpret=interpret, tile=tile,
                              transposed=True)
        return mm, win.T
    M = slices.shape[1]
    TM = min(tile, max(128, M))
    pad = (-M) % TM
    if pad:
        zs = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
        slices, shift, conv, lane = (
            zs(slices), jnp.pad(shift, (0, pad)), zs(conv), zs(lane)
        )
    Mp = M + pad
    grid = (Mp // TM,)
    kern = functools.partial(_verify_kernel, W=W)
    mm, win = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W + 1, TM), lambda i: (0, i)),
            pl.BlockSpec((1, TM), lambda i: (0, i)),
            pl.BlockSpec((W, TM), lambda i: (0, i)),
            pl.BlockSpec((W, TM), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, TM), lambda i: (0, i)),
            pl.BlockSpec((W, TM), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Mp), jnp.int32),
            jax.ShapeDtypeStruct((W, Mp), jnp.uint32),
        ],
        interpret=interpret,
    )(slices, shift.reshape(1, Mp), conv, lane)
    return mm[0, :M], win[:, :M]


def verify_flat_reference(slices, shift, conv, lane, *, W):
    """jnp oracle with identical semantics (used by tests; (M, W+1) in)."""
    sh = shift.astype(jnp.uint32)[:, None]
    lo = slices[:, :W]
    hi = slices[:, 1:]
    win = jnp.where(sh == 0, lo,
                    (lo << sh) | ((hi >> (jnp.uint32(31) - sh)) >> 1))
    d = win ^ conv
    fold = d | (d >> 1)
    mm = jnp.sum(
        jax.lax.population_count(fold & lane), axis=-1, dtype=jnp.int32
    )
    return mm, win
