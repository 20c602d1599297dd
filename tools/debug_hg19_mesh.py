"""Run the hg19 tp=4/key16 mesh backend on just the mesh-missing reads.

Phase 1 (cheap): native se_exact on the subset -- if this disagrees with
the stage-5 full-batch run, the host replay is the culprit.
Phase 2: the mesh backend's map_single_end on the subset + controls,
dumping per-read (fb, pos, times, mm) vs the se_exact truth.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402

WORK = os.path.join(REPO, "bench_cache", "hg19")
INDEX = os.path.join(WORK, "hg19s.dbindex")


def read_names(path):
    out = {}
    with open(path) as f:
        for line in f:
            p = line.split("\t")
            if len(p) > 4:
                out[p[3]] = line.strip()
    return out


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from walt_tpu import native
    from walt_tpu.constants import BASE_TO_CODE, get_pattern
    from walt_tpu.core.jax_backend import JaxBackend
    from walt_tpu.index import io_walt
    from walt_tpu.parallel import make_mesh

    pattern = get_pattern("3")
    host = read_names(os.path.join(WORK, "out_host.mr"))
    mesh = read_names(os.path.join(WORK, "out_mesh.mr"))
    missing = [n for n in host if n not in mesh]
    controls = [n for n in host if n in mesh][:16]
    want = missing[:48] + controls
    order = {n: i for i, n in enumerate(want)}
    seqs = [None] * len(want)
    with open(os.path.join(WORK, "reads.fastq")) as f:
        while True:
            h = f.readline()
            if not h:
                break
            seq = f.readline().strip()
            f.readline()
            f.readline()
            name = h[1:].split()[0]
            if name in order:
                seqs[order[name]] = seq
    n = len(want)
    L = max(len(s) for s in seqs)
    codes = np.zeros((n, L), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int32)
    for i, s in enumerate(seqs):
        codes[i, : len(s)] = BASE_TO_CODE[
            np.frombuffer(s.encode(), dtype=np.uint8)
        ]
        lens[i] = len(s)

    gm, _ = io_walt.read_head(INDEX)
    tables = [io_walt.read_table_cached(INDEX + s, gm)
              for s in ("_CT00", "_CT01")]

    print("phase 1: native se_exact on the subset")
    got = native.se_exact(codes, lens, tables, False, 5000, 6, pattern)
    assert got is not None
    e_pos, e_times, e_minus, e_mm = got
    bad = 0
    for i, name in enumerate(want):
        line = host[name]
        # host line: chrom start end name mm strand ...
        p = line.split("\t")
        # recompute chrom-relative from pos
        ok = (int(e_times[i]) == 1)
        if name in missing and not ok:
            bad += 1
            if bad <= 5:
                print(f"  {name}: se_exact subset says times={int(e_times[i])}"
                      f" mm={int(e_mm[i])} pos={int(e_pos[i])}"
                      f" minus={bool(e_minus[i])} | host line {line[:70]}")
    print(f"  subset se_exact disagrees with stage-5 on {bad}/{len(missing[:48])} missing reads")

    print("phase 2: mesh backend on the subset (table build ~25 min)")
    be = JaxBackend(mesh=make_mesh(jax.devices()[:4], tp=4),
                    tp_accel="key16")
    m_pos, m_times, m_minus, m_mm, m_fb = be.map_single_end(
        codes, lens, tables, 5000, 6, pattern
    )
    print("name       fb  mesh(times,mm,pos)        exact(times,mm,pos)")
    for i, name in enumerate(want):
        tag = "MISS" if name in missing else "ctrl"
        agree = (int(m_times[i]) == int(e_times[i])
                 and int(m_mm[i]) == int(e_mm[i])
                 and (int(m_pos[i]) == int(e_pos[i]) or m_fb[i]))
        if tag == "MISS" or not agree or i < 4:
            print(f"{name:8} {tag} fb={int(m_fb[i])} "
                  f"({int(m_times[i])},{int(m_mm[i])},{int(m_pos[i])}) "
                  f"({int(e_times[i])},{int(e_mm[i])},{int(e_pos[i])})"
                  f"{'' if agree else '   <-- DIVERGES'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
