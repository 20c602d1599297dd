"""Diagnose hg19 mesh-vs-host mapping mismatches by numpy emulation.

Loads the hg19-scale tables, takes reads that the host path mapped but the
tp=4/key16 mesh run did not, and for each (strand, seed) emulates the
key16 refinement exactly as map_strand_core's key16 branch does --
entry-space lower bound over (word0 >> 16), slab membership, window cared
check inputs -- reporting where the device pipeline's view diverges from
the exact oracle.  Pure host/NumPy: no device, cheap to iterate.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

WORK = os.path.join(REPO, "bench_cache", "hg19")
INDEX = os.path.join(WORK, "hg19s.dbindex")


def read_names(path):
    out = {}
    with open(path) as f:
        for line in f:
            p = line.split("\t")
            if len(p) > 4:
                out[p[3]] = line
    return out


def main() -> int:
    from walt_tpu.constants import BASE_TO_CODE, get_pattern
    from walt_tpu.core import refmap
    from walt_tpu.index import io_walt
    from walt_tpu.index.build import seed_keys
    from walt_tpu.ops.device_index import pack_key_words

    pattern = get_pattern("3")
    kw = pattern.key_weight
    host = read_names(os.path.join(WORK, "out_host.mr"))
    mesh = read_names(os.path.join(WORK, "out_mesh.mr"))
    missing = [n for n in host if n not in mesh]
    print(f"{len(missing)} reads host-mapped but mesh-missing")

    # reads
    want = set(missing[:6])
    reads = {}
    with open(os.path.join(WORK, "reads.fastq")) as f:
        while True:
            h = f.readline()
            if not h:
                break
            seq = f.readline().strip()
            f.readline()
            f.readline()
            name = h[1:].split()[0]
            if name in want:
                reads[name] = seq

    gm, _ = io_walt.read_head(INDEX)
    nbl = (4**12) // 4

    tables = {}
    for s in ("_CT00", "_CT01"):
        print(f"loading {s}...")
        tables[s] = io_walt.read_table(INDEX + s, gm)

    for name in list(want):
        seq = reads[name]
        codes = BASE_TO_CODE[np.frombuffer(seq.encode(), dtype=np.uint8)]
        conv = codes.copy()
        conv[conv == 1] = 3  # C->T on 2-bit codes (A0 C1 G2 T3)
        print(f"\n=== {name}: host line {host[name].strip()[:90]}")
        for s, strand in (("_CT00", "+"), ("_CT01", "-")):
            g, ht = tables[s]
            # oracle candidate stream
            cands = list(refmap.enumerate_candidates(
                codes, g, ht, False, 5000, 6, pattern))
            if cands:
                print(f"  strand {strand}: oracle candidates {cands[:6]}")
            seq_pad = refmap.padded_seq(g, pattern)
            for shift in range(pattern.pattern_len):
                sub = conv[shift:]
                key = 0
                for i in range(kw):
                    key = (key << 2) | int(sub[int(pattern.cared[i])])
                lo, hi = int(ht.counter[key]), int(ht.counter[key + 1])
                if lo == hi:
                    continue
                shard = key // nbl
                # read word0 (cared kw..kw+15 of the shifted read)
                rw = 0
                n_c = 0
                seed_len = int(pattern.seed_len_for_len(
                    np.array([len(seq)]))[0])
                for i in range(kw, kw + 16):
                    rw <<= 2
                    if i < seed_len:
                        rw |= int(sub[int(pattern.cared[i])])
                        n_c += 1
                mask_bits = min(max(seed_len - kw, 0), 16) * 2
                m32 = (0xFFFFFFFF << (32 - mask_bits)) & 0xFFFFFFFF \
                    if mask_bits else 0
                rw &= m32
                entries = ht.index[lo:hi]
                w0 = pack_key_words(seq_pad, entries, pattern, n_words=1)[:, 0]
                k16 = (w0 >> np.uint32(16)).astype(np.uint32)
                m16 = np.uint32(m32 >> 16)
                rw16 = np.uint32(rw >> 16)
                ge = (k16 & m16) >= rw16
                lower = int(np.argmax(ge)) if ge.any() else hi - lo
                eq = (k16[lower:] & m16) == rw16
                run = int(np.argmin(eq)) if not eq.all() else eq.size
                # where do the oracle's candidates for this shift sit?
                oc = [c for c in cands if c[0] == shift]
                in_run = []
                for c in oc:
                    gpos = int(c[1]) + shift
                    w = np.flatnonzero(entries == gpos)
                    in_run += [
                        (int(x), lower <= int(x) < lower + min(run, 8))
                        for x in w
                    ]
                print(f"    shift {shift}: bucket {key} shard {shard} "
                      f"size {hi - lo} lower {lower} run16 {run} "
                      f"oracle-in-slab {in_run}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
