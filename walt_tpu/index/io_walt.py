"""Byte-exact reader/writer for the reference's 5-file index format.

Format (see SURVEY.md section 2.4; ``src/walt/reference.cpp:302-417``):

``<name>.dbindex`` header:
    u32 num_of_chroms,
    per chrom: u32 name_len (capped 255), name bytes,
    u32 lengths[num_of_chroms], u32 length_of_genome, u32 size_of_index.

``<name>_CT00 / _CT01 / _GA10 / _GA11`` tables:
    char strand ('+'/'-'),
    char sequence[length_of_genome]   (the CONVERTED genome text),
    u32 counter_size (=4^12), u32 index_size,
    u32 counter[counter_size+1], u32 index[index_size].

All integers little-endian u32.  This module lets the TPU mapper consume
indexes produced by the reference ``makedb`` (used heavily by the golden
tests) and produce indexes the reference ``walt`` can consume.
"""

from __future__ import annotations

import dataclasses
import os
import struct

import numpy as np

from walt_tpu.constants import BASE_TO_CODE, CODE_TO_BASE, get_pattern
from walt_tpu.genome import Genome
from walt_tpu.index.build import HashTable

SUFFIXES = ("_CT00", "_CT01", "_GA10", "_GA11")


def write_table(path: str, genome: Genome, table: HashTable) -> None:
    """WriteIndex equivalent (reference.cpp:302-322)."""
    with open(path, "wb") as f:
        f.write(genome.strand.encode())
        f.write(CODE_TO_BASE[genome.seq].tobytes())
        f.write(struct.pack("<II", table.counter_size, table.index_size))
        f.write(table.counter.astype("<u4").tobytes())
        f.write(table.index.astype("<u4").tobytes())


def read_table(path: str, genome: Genome) -> tuple:
    """ReadIndex equivalent (reference.cpp:324-351).

    ``genome`` supplies chromosome metadata (from the header); returns a new
    Genome carrying the converted sequence read from the table file, plus the
    HashTable.
    """
    glen = int(genome.start_index[-1])
    with open(path, "rb") as f:
        strand = f.read(1).decode()
        seq = BASE_TO_CODE[np.frombuffer(f.read(glen), dtype=np.uint8)]
        counter_size, index_size = struct.unpack("<II", f.read(8))
        counter = np.frombuffer(f.read(4 * (counter_size + 1)), dtype="<u4").astype(
            np.uint32
        )
        index = np.frombuffer(f.read(4 * index_size), dtype="<u4").astype(np.uint32)
    g = dataclasses.replace(genome, seq=seq, strand=strand)
    return g, HashTable(counter=counter, index=index)


_table_cache: dict = {}


def read_table_cached(path: str, genome: Genome) -> tuple:
    """``read_table`` with a process-wide cache keyed by (path, mtime, size).

    The reference re-reads every table from disk once per batch per strand
    (mapping.cpp:491-492) purely to bound RAM; here tables are long-lived
    host/device residents, and identity-stable objects let the device
    backend reuse its uploaded copies across runs.
    """
    st = os.stat(path)
    key = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    if key not in _table_cache:
        _table_cache[key] = read_table(path, genome)
    return _table_cache[key]


def write_head(path: str, genome: Genome, size_of_index: int) -> None:
    """WriteIndexHeadInfo equivalent (reference.cpp:353-379)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<I", genome.n_chroms))
        for name in genome.names:
            b = name.encode()[:255]
            f.write(struct.pack("<I", len(b)))
            f.write(b)
        f.write(genome.lengths.astype("<u4").tobytes())
        f.write(struct.pack("<II", genome.length_of_genome, size_of_index))


def read_head(path: str) -> tuple:
    """ReadIndexHeadInfo equivalent (reference.cpp:381-417).

    Returns (Genome with empty sequence, size_of_index).
    """
    with open(path, "rb") as f:
        (n,) = struct.unpack("<I", f.read(4))
        names = []
        for _ in range(n):
            (ln,) = struct.unpack("<I", f.read(4))
            names.append(f.read(ln).decode())
        lengths = np.frombuffer(f.read(4 * n), dtype="<u4").astype(np.uint32)
        glen, size_of_index = struct.unpack("<II", f.read(8))
    start = np.zeros(n + 1, dtype=np.uint32)
    np.cumsum(lengths, out=start[1:])
    assert int(start[-1]) == glen, "corrupt index header"
    genome = Genome(
        names=names,
        lengths=lengths,
        start_index=start,
        seq=np.zeros(0, dtype=np.uint8),
    )
    return genome, size_of_index


def write_index(prefix: str, genome: Genome, tables: dict) -> None:
    """Write the full 5-file set (makedb.cpp:144-159)."""
    size_of_index = 0
    for conv in SUFFIXES:
        g, t = tables[conv.lstrip("_")]
        write_table(prefix + conv, g, t)
        size_of_index = max(size_of_index, t.index_size)
    write_head(prefix, genome, size_of_index)
