"""glibc rand() emulation correctness."""

import shutil
import subprocess

import pytest

from walt_tpu.glibc_rand import GlibcRand

# First outputs of glibc rand() for srand(0)/srand(1) -- fixed for all glibc
# versions (TYPE_3 generator).
SEED0_FIRST = [
    1804289383, 846930886, 1681692777, 1714636915, 1957747793,
    424238335, 719885386, 1649760492, 596516649, 1189641421,
]


def test_seed0_golden():
    assert list(GlibcRand(0).take(10)) == SEED0_FIRST
    assert list(GlibcRand(1).take(10)) == SEED0_FIRST


@pytest.mark.skipif(shutil.which("gcc") is None, reason="no C compiler")
@pytest.mark.parametrize("seed", [0, 1, 42, 123456789, 2**31, 2**32 - 1])
def test_against_libc(seed, tmp_path):
    src = tmp_path / "r.c"
    src.write_text(
        '#include <stdio.h>\n#include <stdlib.h>\n'
        "int main(int c, char**v){srand((unsigned)strtoul(v[1],0,10));"
        'for(int i=0;i<3000;i++)printf("%d\\n",rand());return 0;}\n'
    )
    exe = tmp_path / "r"
    subprocess.run(["gcc", "-O1", "-o", exe, src], check=True)
    out = subprocess.run([exe, str(seed)], capture_output=True, text=True)
    expect = [int(x) for x in out.stdout.split()]
    assert list(GlibcRand(seed).take(3000)) == expect
