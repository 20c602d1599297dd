"""JAX/TPU mapping backend.

Wraps the jitted device pipeline (walt_tpu.ops.pipeline): prepares
device-resident tables (packed lookup keys), tiles batches into fixed-shape
chunks (one compile per (chunk, Lmax) shape, reused across batches), and
returns candidate slabs.  Reads whose candidates do not fit the fixed device
shapes (or touch flagged buckets) are flagged for the exact NumPy path --
output is identical either way.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from walt_tpu.constants import PAD_CODE, SeedPattern
from walt_tpu.core import refmap
from walt_tpu.genome import Genome
from walt_tpu.index.build import HashTable
from walt_tpu.ops import pipeline
from walt_tpu.ops.device_index import DeviceTable, build_device_table


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class JaxBackend:
    name = "jax"

    def __init__(self, chunk: int = 8192, len_pad: int = 32,
                 verify_slab: int = pipeline.VERIFY_SLAB,
                 cand_slab: int = pipeline.CAND_SLAB):
        self.chunk = chunk
        self.len_pad = len_pad
        self.verify_slab = verify_slab
        self.cand_slab = cand_slab
        self._tables = {}
        self.fallback_reads = 0
        self.total_reads = 0

    def _device_table(self, genome: Genome, table: HashTable,
                      pattern: SeedPattern):
        key = (id(genome), id(table), pattern.name)
        if key not in self._tables:
            dt = build_device_table(genome, table, pattern)
            self._tables[key] = (
                dt,
                dict(
                    seq=jnp.asarray(dt.seq),
                    counter=jnp.asarray(dt.counter),
                    index=jnp.asarray(dt.index),
                    key_words=jnp.asarray(dt.key_words),
                    start_index=jnp.asarray(dt.start_index),
                    bucket_flagged=jnp.asarray(dt.bucket_flagged),
                ),
            )
        return self._tables[key]

    def map_strand_slabs(self, codes: np.ndarray, lens: np.ndarray,
                         genome: Genome, table: HashTable, ag_wildcard: bool,
                         b: int, max_mismatches: int, pattern: SeedPattern):
        """Candidate slabs for a batch against one table.

        Returns (cand_seed (n,C) int8, cand_pos (n,C) uint32,
        cand_mm (n,C) int32, cand_cnt (n,) int32, fallback (n,) bool).
        """
        n = codes.shape[0]
        dt, dev = self._device_table(genome, table, pattern)
        Lmax = _round_up(max(int(codes.shape[1]), pattern.min_read_len),
                         self.len_pad)
        C = self.cand_slab
        out_seed = np.empty((n, C), dtype=np.int8)
        out_pos = np.empty((n, C), dtype=np.uint32)
        out_mm = np.empty((n, C), dtype=np.int32)
        out_cnt = np.empty(n, dtype=np.int32)
        out_fb = np.empty(n, dtype=bool)

        chunk = min(self.chunk, _round_up(max(n, 1), 256))
        for a in range(0, n, chunk):
            z = min(a + chunk, n)
            padded = np.full((chunk, Lmax), PAD_CODE, dtype=np.uint8)
            padded[: z - a, : codes.shape[1]] = codes[a:z]
            plens = np.zeros(chunk, dtype=np.int32)
            plens[: z - a] = lens[a:z]
            cs, cp, cm, cc, fb = pipeline.map_strand_device(
                jnp.asarray(padded), jnp.asarray(plens),
                jnp.int32(b), jnp.int32(max_mismatches),
                pattern_name=pattern.name, ag_wildcard=ag_wildcard,
                search_bits=dt.max_bucket_bits,
                verify_slab=self.verify_slab, cand_slab=C,
                **dev,
            )
            out_seed[a:z] = np.asarray(cs)[: z - a]
            out_pos[a:z] = np.asarray(cp)[: z - a]
            out_mm[a:z] = np.asarray(cm)[: z - a]
            out_cnt[a:z] = np.asarray(cc)[: z - a]
            out_fb[a:z] = np.asarray(fb)[: z - a]

        self.total_reads += n
        self.fallback_reads += int(out_fb.sum())
        return out_seed, out_pos, out_mm, out_cnt, out_fb

    def map_strand(self, codes: np.ndarray, lens: np.ndarray, genome: Genome,
                   table: HashTable, ag_wildcard: bool, b: int,
                   max_mismatches: int, pattern: SeedPattern) -> list:
        """Per-read ordered candidate lists (exact; slabs + host fallback)."""
        n = codes.shape[0]
        if n == 0:
            return []
        cand_seed, cand_pos, cand_mm, cand_cnt, fallback = self.map_strand_slabs(
            codes, lens, genome, table, ag_wildcard, b, max_mismatches, pattern
        )
        out = []
        seq_padded = None
        for i in range(n):
            if fallback[i]:
                if seq_padded is None:
                    seq_padded = refmap.padded_seq(genome, pattern)
                out.append(
                    list(
                        refmap.enumerate_candidates(
                            codes[i, : int(lens[i])], genome, table,
                            ag_wildcard, b, max_mismatches, pattern,
                            seq_padded=seq_padded,
                        )
                    )
                )
            else:
                c = int(cand_cnt[i])
                out.append(
                    list(
                        zip(
                            cand_seed[i, :c].tolist(),
                            cand_pos[i, :c].tolist(),
                            cand_mm[i, :c].tolist(),
                        )
                    )
                )
        return out
