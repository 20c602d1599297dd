"""The bounded heap must replicate std::priority_queue tie behavior."""

import shutil
import subprocess

import numpy as np
import pytest

from walt_tpu.host.heap import StdPriorityQueue, TopCandidates

CPP = r"""
#include <cstdio>
#include <cstdlib>
#include <queue>
#include <vector>
using namespace std;
struct C { unsigned mm, id; bool operator<(const C&o) const { return mm < o.mm; } };
int main(int argc, char**argv) {
  // stdin: k n, then n lines "mm id"; replay WALT's TopCandidates push rule,
  // then drain and print ids in pop order.
  unsigned k, n; if (scanf("%u %u", &k, &n) != 2) return 1;
  priority_queue<C> q;
  for (unsigned i = 0; i < n; ++i) {
    C c; scanf("%u %u", &c.mm, &c.id);
    if (q.size() < k) q.push(c);
    else if (c.mm < q.top().mm) { q.pop(); q.push(c); }
  }
  while (!q.empty()) { printf("%u %u\n", q.top().mm, q.top().id); q.pop(); }
  return 0;
}
"""


def drain_python(k, items):
    tc = TopCandidates(k)
    for mm, ident in items:
        tc.push((mm, ident))
    return tc.drain()


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ compiler")
def test_against_std_priority_queue(tmp_path):
    src = tmp_path / "pq.cpp"
    src.write_text(CPP)
    exe = tmp_path / "pq"
    subprocess.run(["g++", "-O2", "-o", exe, src], check=True)
    rng = np.random.default_rng(5)
    for trial in range(60):
        k = int(rng.integers(1, 12))
        n = int(rng.integers(0, 120))
        items = [(int(rng.integers(0, 7)), i) for i in range(n)]
        inp = f"{k} {n}\n" + "\n".join(f"{m} {i}" for m, i in items) + "\n"
        out = subprocess.run([exe], input=inp, capture_output=True, text=True)
        expect = [tuple(map(int, ln.split())) for ln in out.stdout.splitlines()]
        got = [(mm, ident) for mm, ident in drain_python(k, items)]
        assert got == expect, f"trial {trial} k={k} n={n}"


def test_heap_basic():
    pq = StdPriorityQueue()
    for v in [3, 1, 4, 1, 5, 9, 2, 6]:
        pq.push((v,))
    out = [pq.pop()[0] for _ in range(len(pq))]
    assert out == sorted([3, 1, 4, 1, 5, 9, 2, 6], reverse=True)
