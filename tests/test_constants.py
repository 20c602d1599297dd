"""Seed-pattern tables must match the reference header exactly.

The fixture JSON was extracted from src/walt/seedpattern.hpp (comments
stripped, integers parsed); regenerate with tests/fixtures/README if the
reference ever changes.
"""

import json
import os

import numpy as np
import pytest

from walt_tpu.constants import get_pattern

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "seedpattern_tables.json")


@pytest.mark.parametrize("name", ["3", "5", "7"])
def test_tables_match_reference(name):
    ref = json.load(open(FIXTURE))[f"SEEDPATTERN{name}"]
    pat = get_pattern(name)
    assert pat.pattern_len == ref["SEEDPATTERNLEN"]
    assert pat.cared_weight == ref["SEEDPATTERNCAREDWEIGHT"]
    assert pat.nocared_weight == ref["SEEDPATTERNNOCAREDWEIGHT"]
    assert pat.min_read_len == ref["MINIMALREADLEN"]
    assert pat.min_seed_len == ref["MINIMALSEEDLEN"]
    assert pat.key_weight == ref["F2SEEDKEYWEIGHT"]
    assert list(pat.cared) == ref["F2CAREDPOSITION"]
    assert pat.cared_size == ref["F2CAREDPOSITION_SIZE"]
    for s, row in enumerate(ref["F2NOCAREDPOSITION"]):
        assert list(pat.nocared[s, : len(row)]) == row, f"shift {s}"
        assert pat.nocared_len[s] == len(row)
    # the full pattern array is the period repeated
    period = np.array(ref["F2SEEDPATTERN"][: pat.pattern_len])
    assert list(period) == list(pat.period)
    full = ref["F2SEEDPATTERN"]
    assert all(full[i] == full[i % pat.pattern_len] for i in range(len(full)))


def test_pattern3_verify_skip_positions():
    """The two load-bearing typos: entries 47 and 95 of shift-2 no-cared."""
    pat = get_pattern("3")
    assert pat.nocared[2, 47] == 60  # canonical would be 70
    assert pat.nocared[2, 95] == 141  # canonical would be 142
    assert pat.verify_skip == ((2, 23, 70), (2, 47, 142))


def test_repeats_and_seed_len():
    pat = get_pattern("3")
    assert int(pat.repeats_for_len(38)) == 12
    assert int(pat.repeats_for_len(101)) == 33
    assert int(pat.repeats_for_len(1000)) == 50
    assert int(pat.seed_len_for_len(101)) == 33
    pat7 = get_pattern("7")
    assert int(pat7.seed_len_for_len(1000)) == 80  # clamped to table size
