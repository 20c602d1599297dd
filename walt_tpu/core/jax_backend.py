"""JAX/TPU mapping backend.

Wraps the jitted device pipeline (walt_tpu.ops.pipeline): prepares
device-resident tables (packed lookup keys), pads batches to stable shapes
to avoid recompiles, and converts the returned candidate slabs into the
ordered streams the host replay consumes.  Reads whose candidates do not fit
the fixed device shapes (or touch flagged buckets) are remapped with the
exact NumPy path -- output is identical either way.
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

    def __init__(self, batch_pad: int = 512, len_pad: int = 32,
                 verify_slab: int = pipeline.VERIFY_SLAB,
                 cand_slab: int = pipeline.CAND_SLAB):
        self.batch_pad = batch_pad
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

    def map_strand(self, codes: np.ndarray, lens: np.ndarray, genome: Genome,
                   table: HashTable, ag_wildcard: bool, b: int,
                   max_mismatches: int, pattern: SeedPattern) -> list:
        n = codes.shape[0]
        if n == 0:
            return []
        dt, dev = self._device_table(genome, table, pattern)

        B = _round_up(n, self.batch_pad)
        Lmax = _round_up(max(int(codes.shape[1]), pattern.min_read_len), self.len_pad)
        padded = np.full((B, Lmax), PAD_CODE, dtype=np.uint8)
        padded[:n, : codes.shape[1]] = codes
        plens = np.zeros(B, dtype=np.int32)
        plens[:n] = lens

        cand_seed, cand_pos, cand_mm, cand_cnt, fallback = (
            np.asarray(x)
            for x in pipeline.map_strand_device(
                jnp.asarray(padded), jnp.asarray(plens),
                jnp.int32(b), jnp.int32(max_mismatches),
                pattern_name=pattern.name, ag_wildcard=ag_wildcard,
                search_bits=dt.max_bucket_bits,
                verify_slab=self.verify_slab, cand_slab=self.cand_slab,
                **dev,
            )
        )

        self.total_reads += n
        out = []
        seq_padded = None
        for i in range(n):
            if fallback[i]:
                self.fallback_reads += 1
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
