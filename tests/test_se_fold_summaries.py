"""Property tests: the summary-based BestMatch fold == the NumPy spec.

se_fold folds via per-(read, seed) segment summaries (the representation
tp shards exchange instead of candidate slabs); these tests pin its
equivalence to host.replay_vec (the executable NumPy spec of
mapping.cpp:224-316) on adversarial random slabs -- heavy position
collisions (the ``times`` dedup quirk), empty segments, all-seed mixes --
and pin the shard-split path: summaries computed on disjoint candidate
partitions, select-combined, must fold identically to the whole slab.
"""

import numpy as np
import pytest

from walt_tpu.constants import get_pattern


def _random_slab(rng, B, C, n_seeds):
    seed = rng.integers(-1, n_seeds, (B, C)).astype(np.int8)
    # tiny position alphabet: forces the adjacent-dedup / anchor quirks
    pos = rng.integers(0, 5, (B, C)).astype(np.uint32)
    mm = rng.integers(0, 7, (B, C)).astype(np.int32)
    return seed, pos, mm


@pytest.mark.parametrize("trial", range(5))
def test_fold_matches_numpy_spec(trial):
    import jax.numpy as jnp

    from walt_tpu.host.replay_vec import replay_single_batch
    from walt_tpu.ops import se_fold

    pattern = get_pattern("3")
    rng = np.random.default_rng(100 + trial)
    B, C = 64, 16
    slabs = [_random_slab(rng, B, C, pattern.pattern_len) for _ in range(2)]

    want = replay_single_batch(
        [(s, p, m) for s, p, m in slabs], 6, pattern
    )
    got = se_fold.se_fold(
        [(jnp.asarray(s), jnp.asarray(p), jnp.asarray(m))
         for s, p, m in slabs],
        6, pattern,
    )
    np.testing.assert_array_equal(np.asarray(got[0]).astype(np.int64), want[0])
    np.testing.assert_array_equal(np.asarray(got[1]).astype(np.int64), want[1])
    np.testing.assert_array_equal(np.asarray(got[2]), want[2])
    np.testing.assert_array_equal(np.asarray(got[3]).astype(np.int64), want[3])


@pytest.mark.parametrize("trial", range(3))
def test_shard_split_summaries_combine(trial):
    """Splitting each read's candidates by (read, seed) across T shards and
    select-combining the summaries folds exactly like the whole slab."""
    import jax.numpy as jnp

    from walt_tpu.ops import se_fold

    pattern = get_pattern("3")
    rng = np.random.default_rng(300 + trial)
    B, C, T = 48, 16, 4
    summaries_full, summaries_split = [], []
    for _ in range(2):  # two strand tables
        seed, pos, mm = _random_slab(rng, B, C, pattern.pattern_len)
        summaries_full.append(se_fold.segment_summaries(
            jnp.asarray(seed), jnp.asarray(pos), jnp.asarray(mm), pattern
        ))
        # a (read, seed) group lives wholly on ONE shard (bucket-disjoint
        # sharding invariant): route each (read, seed) to a random shard,
        # compact each shard's survivors left in original order
        route = rng.integers(0, T, (B, pattern.pattern_len))
        parts = []
        for t in range(T):
            s_t = np.full_like(seed, -1)
            p_t = np.zeros_like(pos)
            m_t = np.zeros_like(mm)
            for b in range(B):
                cols = [
                    c for c in range(C)
                    if seed[b, c] >= 0 and route[b, seed[b, c]] == t
                ]
                for k, c in enumerate(cols):
                    s_t[b, k] = seed[b, c]
                    p_t[b, k] = pos[b, c]
                    m_t[b, k] = mm[b, c]
            parts.append(se_fold.segment_summaries(
                jnp.asarray(s_t), jnp.asarray(p_t), jnp.asarray(m_t), pattern
            ))
        summaries_split.append(se_fold.combine_summaries(parts))

    want = se_fold.fold_summaries(summaries_full, 6, pattern)
    got = se_fold.fold_summaries(summaries_split, 6, pattern)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
