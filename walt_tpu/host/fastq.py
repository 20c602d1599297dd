"""Batched FASTQ loading with reference-identical byte semantics.

Reproduces ``LoadReadsFromFastqFile`` (``src/walt/mapping.cpp:65-121``)
including its quirks, because every one of them is observable in the output:

- lines are read with ``fgets`` into a 1000-byte buffer, so physical lines
  longer than 999 bytes are split into multiple logical lines;
- exactly one trailing character is stripped from each logical line (the
  newline -- or a data byte when the line was split or the file does not end
  with a newline);
- empty logical lines are skipped without advancing the 4-line cadence;
- the read name is the line minus its first byte, truncated at the first
  space (mapping.cpp:87-94);
- the adaptor, when given, is clipped by an N-fill *before* non-ACGT
  randomization, so clipped tails turn into random bases
  (mapping.cpp:96-104, util.hpp:202-217);
- non-ACGT bytes (including lower-case bases!) become ``rand() % 4`` with the
  stream reseeded ``srand(0)`` per batch (mapping.cpp:73, util.hpp:156-163).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from walt_tpu.constants import BASE_TO_CODE, CODE_TO_BASE, MAX_LINE_LENGTH, PAD_CODE
from walt_tpu.glibc_rand import GlibcRand

_HEAD_LENGTH = 14  # util.hpp:189
_SUFFICIENT_HEAD_MATCH = 11  # util.hpp:190
_MIN_OVERLAP = 5  # util.hpp:191


class FgetsLines:
    """Iterates logical lines exactly like fgets(buf, 1000, f)."""

    def __init__(self, path_or_file):
        if hasattr(path_or_file, "read"):
            self._f = path_or_file
        else:
            self._f = open(path_or_file, "rb")
        self._buf = b""

    def close(self):
        self._f.close()

    def next_line(self):
        """One fgets call: up to MAX_LINE_LENGTH-1 bytes, through a newline.

        Returns None at EOF.
        """
        limit = MAX_LINE_LENGTH - 1
        while True:
            nl = self._buf.find(b"\n", 0, limit)
            if nl >= 0:
                line, self._buf = self._buf[: nl + 1], self._buf[nl + 1 :]
                return line
            if len(self._buf) >= limit:
                line, self._buf = self._buf[:limit], self._buf[limit:]
                return line
            chunk = self._f.read(65536)
            if not chunk:
                if self._buf:
                    line, self._buf = self._buf, b""
                    return line
                return None
            self._buf += chunk


def clip_adaptor(seq: bytearray, adaptor: bytes) -> None:
    """clip_adaptor_from_read (util.hpp:202-217): N-fill the 3' tail in place.

    For reads shorter than the 14-byte head window the reference underflows a
    size_t and scans out of bounds (undefined); we treat such reads as
    unclippable.
    """
    n = len(seq)
    if n < _HEAD_LENGTH:
        return

    def similarity(pos: int) -> int:
        lim = min(n - pos, len(adaptor), _HEAD_LENGTH)
        return sum(seq[pos + i] == adaptor[i] for i in range(lim))

    lim1 = n - _HEAD_LENGTH + 1
    for i in range(lim1):
        if similarity(i) >= _SUFFICIENT_HEAD_MATCH:
            seq[i:] = b"N" * (n - i)
            return
    for i in range(lim1, n - _MIN_OVERLAP + 1):
        if similarity(i) >= n - i - 1:
            seq[i:] = b"N" * (n - i)
            return


@dataclasses.dataclass
class ReadBatch:
    names: list  # str
    seqs: list  # bytes (post clip + toACGT: strictly ACGT)
    quals: list  # bytes

    def __len__(self):
        return len(self.names)

    def packed(self, pad_to: int | None = None):
        """(codes uint8 (B, Lmax) PAD_CODE-padded, lengths int32 (B,))."""
        lens = np.array([len(s) for s in self.seqs], dtype=np.int32)
        lmax = int(pad_to or (lens.max() if len(lens) else 0))
        codes = np.full((len(self.seqs), lmax), PAD_CODE, dtype=np.uint8)
        for i, s in enumerate(self.seqs):
            codes[i, : len(s)] = BASE_TO_CODE[np.frombuffer(s, dtype=np.uint8)]
        return codes, lens


def load_batch(lines: FgetsLines, n_reads: int, adaptor: bytes = b"") -> ReadBatch:
    """One batch of up to n_reads records (mapping.cpp:65-121)."""
    rng = GlibcRand(0)  # srand(0) per batch, mapping.cpp:73
    names, seqs, quals = [], [], []
    line_code = 0
    line_count = 0
    lim = n_reads * 4
    name = seq = None
    while line_count < lim:
        raw = lines.next_line()
        if raw is None:
            break
        line = raw[:-1]  # cline[strlen-1] = 0: strip exactly one byte
        if len(line) == 0:
            continue
        if line_code == 0:
            sp = line.find(b" ")
            name = line[1:] if sp < 0 else line[1:sp]
        elif line_code == 1:
            s = bytearray(line)
            if adaptor:
                clip_adaptor(s, adaptor)
            # toACGT per byte, in order (consumes rand() for each non-ACGT)
            codes = BASE_TO_CODE[np.frombuffer(bytes(s), dtype=np.uint8)]
            bad = np.flatnonzero(codes == 255)
            if bad.size:
                codes = codes.copy()
                codes[bad] = rng.random_bases(bad.size)
            seq = CODE_TO_BASE[codes].tobytes()
        elif line_code == 3:
            names.append(name.decode())
            seqs.append(seq)
            quals.append(bytes(line))
        line_count += 1
        line_code = (line_code + 1) & 3
    return ReadBatch(names=names, seqs=seqs, quals=quals)
