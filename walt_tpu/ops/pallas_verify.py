"""Pallas TPU kernel for the candidate-verify hot op.

The verify stage (the reference's per-base mismatch loop,
src/walt/mapping.cpp:288-304, restructured in ops/pipeline.py) is, per
candidate: align a (W+1)-word raw genome slice to the candidate's bit
offset, XOR against the converted read, OR-fold each 2-bit lane, popcount
under the read-length mask (-> mismatch count), and AND against the cared
mask (-> membership in the refined equal range).  In the XLA formulation
every intermediate is a (B, S, C, W) array; XLA fuses most of the chain,
but the schedule and VMEM blocking are the compiler's choice.

This kernel pins the whole chain in VMEM explicitly: one grid step loads a
(TB, S*C, W+1) tile of raw slices plus the (TB, W) read words and writes
only the (TB, S*C) mismatch counts and cared-miss flags -- the aligned
window never exists in HBM.  The genome gather itself stays in XLA
(jnp.take lowers to a fast native gather; candidate positions have no
block locality a Pallas DMA schedule could exploit).

Enabled with WALTX_PALLAS=1 (see ops/pipeline.py); the XLA path remains
the default because on the tunnel-attached bench device the two are within
noise (the pipeline is round-trip-latency-bound), and the XLA path also
runs on the CPU test mesh.  Correctness is tested in interpreter mode on
CPU (tests/test_pallas.py) against the jnp formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

#: reads per grid step; S*C*(W+1) uint32 slice rows must fit VMEM alongside
#: the outputs (512 reads x 24 rows x 9 words x 4 B ~= 440 KB at slab 8)
TILE_READS = 512


def _verify_kernel(slices_ref, shift_ref, conv_ref, lane_ref, cared_ref,
                   mm_ref, miss_ref, *, S: int, C: int, W: int):
    """One (TB, S*C) tile: align + compare + fold + count.

    slices: (TB, S*C, W+1) u32 raw genome words starting at gpos >> 4
    shift:  (TB, S*C) u32, 2 * (gpos & 15)
    conv:   (TB, W) u32 converted read words
    lane:   (TB, W) u32 read-length lane masks
    cared:  (TB, S, W) u32 cared-position masks (per seed shift)
    mm:     (TB, S*C) i32 mismatching-lane count over the masked window
    miss:   (TB, S*C) i32 nonzero iff any cared lane differs
    """
    # Mosaic cannot lower mixed slice+newaxis indexing (it becomes a
    # gather); use explicit lax.slice_in_dim + expand_dims throughout
    shift = shift_ref[:, :]
    conv = jnp.expand_dims(conv_ref[:, :], 1)
    lane = jnp.expand_dims(lane_ref[:, :], 1)
    for s in range(S):
        sl = slices_ref[:, s * C:(s + 1) * C, :]
        sh = jnp.expand_dims(
            jax.lax.slice_in_dim(shift, s * C, (s + 1) * C, axis=1), 2
        )
        cared = jnp.expand_dims(cared_ref[:, s, :], 1)
        lo = jax.lax.slice_in_dim(sl, 0, W, axis=2)
        hi = jax.lax.slice_in_dim(sl, 1, W + 1, axis=2)
        # funnel-align; (hi >> (31 - sh)) >> 1 guards the undefined >>32
        win = jnp.where(
            sh == 0, lo, (lo << sh) | ((hi >> (jnp.uint32(31) - sh)) >> 1)
        )
        d = win ^ conv
        fold = d | (d >> 1)
        mm_ref[:, s * C:(s + 1) * C] = jnp.sum(
            jax.lax.population_count(fold & lane),
            axis=-1, dtype=jnp.int32,
        )
        miss_ref[:, s * C:(s + 1) * C] = jnp.sum(
            fold & cared, axis=-1, dtype=jnp.int32
        )


@functools.partial(
    jax.jit, static_argnames=("S", "C", "W", "interpret", "tile")
)
def verify_slices(slices, shift, conv, lane, cared, *, S: int, C: int,
                  W: int, interpret: bool = False, tile: int = TILE_READS):
    """Fused verify over pre-gathered slices.

    Returns (mm (B, S, C) int32, cared_miss (B, S, C) bool); semantics match
    the jnp chain in ops/pipeline.map_strand_core (win/fold/popcount and the
    refinement-by-match membership test).
    """
    B = slices.shape[0]
    # keep the slice tile under ~4 MB of VMEM (large verify slabs shrink TB)
    vmem_rows = max(8, (4 << 20) // (S * C * (W + 1) * 4))
    TB = min(tile, vmem_rows, max(8, B))
    pad = (-B) % TB
    if pad:
        zs = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        slices, shift, conv, lane, cared = map(
            zs, (slices, shift, conv, lane, cared)
        )
    Bp = B + pad
    grid = (Bp // TB,)
    kern = functools.partial(_verify_kernel, S=S, C=C, W=W)
    mm, miss = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, S * C, W + 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, S * C), lambda i: (i, 0)),
            pl.BlockSpec((TB, W), lambda i: (i, 0)),
            pl.BlockSpec((TB, W), lambda i: (i, 0)),
            pl.BlockSpec((TB, S, W), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TB, S * C), lambda i: (i, 0)),
            pl.BlockSpec((TB, S * C), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, S * C), jnp.int32),
            jax.ShapeDtypeStruct((Bp, S * C), jnp.int32),
        ],
        interpret=interpret,
    )(slices, shift, conv, lane, cared)
    mm = mm[:B].reshape(B, S, C)
    miss = miss[:B].reshape(B, S, C)
    return mm, miss != 0


def verify_slices_reference(slices, shift, conv, lane, cared, *, S, C, W):
    """jnp oracle with identical semantics (used by tests)."""
    B = slices.shape[0]
    sl = slices.reshape(B, S, C, W + 1)
    sh = shift.reshape(B, S, C).astype(jnp.uint32)[..., None]
    lo = sl[..., :W]
    hi = sl[..., 1:]
    win = jnp.where(sh == 0, lo,
                    (lo << sh) | ((hi >> (jnp.uint32(31) - sh)) >> 1))
    d = win ^ conv[:, None, None, :]
    fold = d | (d >> 1)
    mm = jnp.sum(
        jax.lax.population_count(fold & lane[:, None, None, :]),
        axis=-1, dtype=jnp.int32,
    )
    miss = jnp.any(fold & cared[:, :, None, :], axis=-1)
    return mm, miss
