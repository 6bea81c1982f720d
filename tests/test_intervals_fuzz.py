"""Property fuzz: the vectorized minimal-interval kernels vs a
brute-force enumerator of Vigna minimal-interval semantics, and the
gapped phrase matcher vs a positional brute force."""

import itertools

import numpy as np
import pytest

from pim_lucene_spark.functions.intervals import (
    _KEY_SHIFT,
    _minimal_ordered,
    _minimal_unordered,
    interval_freqs_keys,
)


def _brute_minimal(pos_lists, ordered):
    """All minimal intervals by enumeration: every combination of one
    position per slot that satisfies the order constraint, reduced to
    the antichain (no interval contains another)."""
    cands = set()
    for combo in itertools.product(*pos_lists):
        if ordered:
            if not all(combo[i] < combo[i + 1]
                       for i in range(len(combo) - 1)):
                continue
        s, e = min(combo), max(combo)
        cands.add((s, e))
    minimal = set()
    for (s, e) in cands:
        if not any((s2 >= s and e2 <= e and (s2, e2) != (s, e))
                   for (s2, e2) in cands):
            minimal.add((s, e))
    return minimal


def _keys(rank, positions):
    return np.array(sorted(rank * int(_KEY_SHIFT) + p
                           for p in positions), dtype=np.int64)


@pytest.mark.parametrize("ordered", [True, False])
@pytest.mark.parametrize("seed", range(40))
def test_minimal_intervals_match_bruteforce(ordered, seed):
    rng = np.random.default_rng(seed)
    n_slots = int(rng.integers(1, 4))
    # distinct positions per slot; slots may overlap in positions only
    # when they model distinct tokens — keep them disjoint like a real
    # token stream (one token per position across DIFFERENT slots), but
    # allow shared positions between a slot and itself
    pool = rng.permutation(24)
    sizes = [int(rng.integers(1, 5)) for _ in range(n_slots)]
    pos_lists, off = [], 0
    for sz in sizes:
        pos_lists.append(sorted(int(x) for x in pool[off:off + sz]))
        off += sz
    keys = [_keys(0, pl) for pl in pos_lists]
    st, en = (_minimal_ordered(keys) if ordered
              else _minimal_unordered(keys))
    got = {(int(s % _KEY_SHIFT), int(e % _KEY_SHIFT))
           for s, e in zip(st, en)}
    assert got == _brute_minimal(pos_lists, ordered), (
        ordered, pos_lists, got)


@pytest.mark.parametrize("seed", range(20))
def test_interval_freqs_multidoc_match_per_doc(seed):
    """Batched multi-doc keys give the same freqs as per-doc calls."""
    rng = np.random.default_rng(100 + seed)
    n_docs = 5
    per_doc = []
    for _ in range(n_docs):
        pool = rng.permutation(20)
        per_doc.append(([int(x) for x in sorted(pool[:3])],
                        [int(x) for x in sorted(pool[3:6])]))
    batched = [
        np.concatenate([_keys(d, per_doc[d][i]) for d in range(n_docs)])
        for i in range(2)
    ]
    got = interval_freqs_keys(batched, n_docs, True, 2, None, "float64")
    for d in range(n_docs):
        solo = interval_freqs_keys(
            [_keys(0, per_doc[d][0]), _keys(0, per_doc[d][1])],
            1, True, 2, None, "float64")
        assert got[d] == solo[0], (d, per_doc[d])


@pytest.mark.parametrize("seed", range(25))
def test_gapped_phrase_counts_match_bruteforce(seed):
    """_phrase_match_counts offsets semantics == positional brute force
    (count of x where every term i sits at x + offset_i)."""
    from pim_lucene_spark.operators.search import _POS_KEY_SHIFT
    rng = np.random.default_rng(200 + seed)
    n_terms = int(rng.integers(2, 4))
    offsets = [0]
    for _ in range(n_terms - 1):
        offsets.append(offsets[-1] + int(rng.integers(1, 4)))
    pos_lists = [sorted(set(int(x) for x in rng.integers(0, 15,
                                                         size=6)))
                 for _ in range(n_terms)]
    # emulate the kernel's shifted-key intersection directly
    keys = None
    for i, pl in enumerate(pos_lists):
        k = np.array([p - offsets[i] for p in pl], dtype=np.int64)
        keys = k if keys is None else np.intersect1d(keys, k)
    got = int(keys.size)
    brute = sum(1 for x in range(-5, 20)
                if all((x + offsets[i]) in pos_lists[i]
                       for i in range(n_terms)))
    assert got == brute, (offsets, pos_lists)
