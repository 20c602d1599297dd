"""Pallas TPU kernel for the candidate-verify hot op.

The verify stage (the reference's per-base mismatch loop,
src/walt/mapping.cpp:288-304, restructured in ops/pipeline.py) is, per
worklist candidate: align a (W+1)-word raw genome slice to the candidate's
bit offset, XOR against the converted read, OR-fold each 2-bit lane, and
popcount under the read-length mask (-> mismatch count).  Refinement
membership is decided from the packed lookup keys *before* the worklist is
built (ops/pipeline.map_strand_core), so this kernel only ever sees real
candidates (typically 1-2 per read), not full slabs.

This kernel pins the align/compare/count chain in VMEM explicitly: one grid
step loads a (TM, W+1) tile of raw slices plus the (TM, W) read words and
writes the (TM,) mismatch counts and the aligned windows (the pipeline's
verify_skip corrections read individual window lanes).  The genome gather
itself stays in XLA (jnp.take lowers to a fast native gather; candidate
positions have no block locality a Pallas DMA schedule could exploit).

Enabled with WALTX_PALLAS=1 (see ops/pipeline.py); the XLA path remains the
default because on the tunnel-attached bench device the two are within
noise, and the XLA path also runs on the CPU test mesh without
interpret-mode overhead.  Correctness is tested in interpreter mode on CPU
(tests/test_pallas.py) against the jnp formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

#: worklist rows per grid step; (TM, W+1) uint32 slice rows plus outputs
#: stay well under VMEM at any practical W (<= 64 words = 1 kbp reads)
TILE_ROWS = 4096


def _verify_kernel(slices_ref, shift_ref, conv_ref, lane_ref,
                   mm_ref, win_ref, *, W: int):
    """One (TM,) tile: align + compare + fold + count.

    slices: (TM, W+1) u32 raw genome words starting at gpos >> 4
    shift:  (TM, 1) u32, 2 * (gpos & 15)
    conv:   (TM, W) u32 converted read words
    lane:   (TM, W) u32 read-length lane masks
    mm:     (TM, 1) i32 mismatching-lane count over the masked window
    win:    (TM, W) u32 the aligned window (for verify_skip corrections)
    """
    sh = shift_ref[:, :]  # (TM, 1)
    lo = jax.lax.slice_in_dim(slices_ref[:, :], 0, W, axis=1)
    hi = jax.lax.slice_in_dim(slices_ref[:, :], 1, W + 1, axis=1)
    # funnel-align; (hi >> (31 - sh)) >> 1 guards the undefined >>32
    win = jnp.where(
        sh == 0, lo, (lo << sh) | ((hi >> (jnp.uint32(31) - sh)) >> 1)
    )
    win_ref[:, :] = win
    d = win ^ conv_ref[:, :]
    fold = d | (d >> 1)
    mm_ref[:, :] = jnp.sum(
        jax.lax.population_count(fold & lane_ref[:, :]),
        axis=-1, keepdims=True, dtype=jnp.int32,
    )


@functools.partial(jax.jit, static_argnames=("W", "interpret", "tile"))
def verify_flat(slices, shift, conv, lane, *, W: int,
                interpret: bool = False, tile: int = TILE_ROWS):
    """Fused verify over a pre-gathered (M, W+1) worklist.

    Returns (mm (M,) int32, win (M, W) uint32); semantics match the jnp
    chain in ops/pipeline.map_strand_core (win/fold/popcount).
    """
    M = slices.shape[0]
    TM = min(tile, max(8, M))
    pad = (-M) % TM
    if pad:
        zs = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        slices, shift, conv, lane = map(zs, (slices, shift, conv, lane))
    Mp = M + pad
    grid = (Mp // TM,)
    kern = functools.partial(_verify_kernel, W=W)
    mm, win = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, W + 1), lambda i: (i, 0)),
            pl.BlockSpec((TM, 1), lambda i: (i, 0)),
            pl.BlockSpec((TM, W), lambda i: (i, 0)),
            pl.BlockSpec((TM, W), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TM, 1), lambda i: (i, 0)),
            pl.BlockSpec((TM, W), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Mp, W), jnp.uint32),
        ],
        interpret=interpret,
    )(slices, shift.reshape(Mp, 1), conv, lane)
    return mm[:M, 0], win[:M]


def verify_flat_reference(slices, shift, conv, lane, *, W):
    """jnp oracle with identical semantics (used by tests)."""
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
