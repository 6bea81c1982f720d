"""Minimal-interval matching over stored position streams.

The proximity family of ``IntervalQuery.java`` (reference:
``lucene/queries/src/java/org/apache/lucene/queries/intervals/``) for
TERM sub-sources — the "A within N words of B, ordered" queries sloppy
phrase cannot express:

- **ordered** (``OrderedIntervalsSource.java:130-172``): sub terms in
  strict order; enumerated intervals follow minimal-interval semantics
  (no reported interval contains another).  For single-position term
  subs the iterator's advance-and-minimize loop reduces exactly to the
  forward-backward construction used here: every occurrence of the LAST
  term is an interval end, each earlier term takes its greatest
  position strictly below its successor, and intervals sharing a start
  keep only the smallest end.
- **unordered** (``UnorderedIntervalsSource``): minimal windows
  containing every term in any order — for each candidate end position,
  the window start is the minimum over terms of each term's latest
  occurrence ≤ end; the same shared-start dedupe leaves the minimal
  antichain.
- **maxgaps / maxwidth** (``FilteredIntervalsSource.java``): filters
  applied to the minimal intervals (gaps = width − minExtent, and for
  term subs minExtent = the term count).

Per-doc frequency and scoring follow ``IntervalScorer.java:75-86`` and
``IntervalScoreFunction.java`` (saturation):
``freq = Σ 1 / max(length − minExtent + 1, 1)`` over the minimal
intervals, ``score = weight · (1 − pivot / (pivot + freq))``.  In
float32 mode the freq sum narrows to float after each double-precision
addition and the score runs in float32 — the Java float expression
tree; float64 mode is ANSI-SQL reproducible.

Everything is vectorized across candidate docs with the same
``rank·2⁴⁰ + position`` key encoding as the phrase matcher — one
searchsorted chain per query term, no per-doc Python loop on the match
path (only the float32 narrowing fold groups per doc).

Repeated terms chain through the same position list with strictly
increasing positions (the natural minimal-interval reading of
``RepeatingIntervalsSource``); exotic repeat edge cases are pinned by
unit tests as this module's contract.
"""

from __future__ import annotations

import numpy as np

_KEY_SHIFT = np.int64(1) << np.int64(40)
_EMPTY_F64 = np.empty(0, dtype=np.float64)


def _term_keys(tp, idx: np.ndarray,
               ranks: np.ndarray | None = None) -> np.ndarray:
    """Candidate positions of one term as sorted
    ``cand_rank * 2^40 + position`` keys (positions decode lazily for
    exactly the candidates given).  ``ranks`` maps each idx entry to
    its candidate rank (defaults to 0..n-1 — the all-candidates case);
    an OR slot passes the subset of candidate ranks where this
    alternative is present."""
    # rank * 2^40 + pos wraps int64 once a RANK reaches 2^23 — fail
    # loudly instead of returning wrong matches (a partition-local
    # candidate set this large means the index is under-partitioned).
    # The bound must cover the ranks actually used: an OR slot passes a
    # subset of the FULL candidate set's ranks, so a small idx can still
    # carry ranks near cand.size (review catch: idx.size alone misses it)
    max_rank = (idx.size if ranks is None
                else (int(ranks.max()) + 1 if ranks.size else 0))
    if max_rank >= (1 << 23):
        raise OverflowError(
            f"interval clause spans candidate ranks up to {max_rank} in "
            "one index partition (>= 2^23, the packed-key rank limit); "
            "rebuild with more num_partitions")
    tp.ensure_positions(idx)
    starts = tp.pos_offsets[idx]
    ends = tp.pos_offsets[idx + 1]
    lens = ends - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    take = np.arange(total, dtype=np.int64) + np.repeat(starts, lens) \
        - np.repeat(np.cumsum(lens) - lens, lens)
    pos = tp.positions[take].astype(np.int64)
    if ranks is None:
        ranks = np.arange(idx.size, dtype=np.int64)
    rk = np.repeat(ranks.astype(np.int64), lens)
    return rk * _KEY_SHIFT + pos


def _minimal_ordered(keys: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Minimal ordered intervals → (start_keys, end_keys), both ascending
    by end.  ``keys[i]`` = sorted candidate-position keys of term i."""
    ends = keys[-1]
    if ends.size == 0:
        return _EMPTY_I64_PAIR
    prev = ends
    valid = np.ones(ends.size, dtype=bool)
    for i in range(len(keys) - 2, -1, -1):
        ki = keys[i]
        if ki.size == 0:
            return _EMPTY_I64_PAIR
        j = np.searchsorted(ki, prev, side="left") - 1
        ok = j >= 0
        pred = ki[np.maximum(j, 0)]
        ok &= (pred // _KEY_SHIFT) == (prev // _KEY_SHIFT)
        valid &= ok
        prev = np.where(ok, pred, prev)
    starts, ends = prev[valid], ends[valid]
    if starts.size == 0:
        return _EMPTY_I64_PAIR
    # shared-start dedupe: ends ascend, so the first occurrence of each
    # start key is its minimal interval
    _, first = np.unique(starts, return_index=True)
    return starts[first], ends[first]


def _minimal_unordered(keys: list[np.ndarray]) -> tuple[np.ndarray,
                                                        np.ndarray]:
    """Minimal unordered windows → (start_keys, end_keys)."""
    if any(k.size == 0 for k in keys):
        return _EMPTY_I64_PAIR
    ends = np.unique(np.concatenate(keys))
    starts = None
    valid = np.ones(ends.size, dtype=bool)
    for ki in keys:
        j = np.searchsorted(ki, ends, side="right") - 1
        ok = j >= 0
        pred = ki[np.maximum(j, 0)]
        ok &= (pred // _KEY_SHIFT) == (ends // _KEY_SHIFT)
        valid &= ok
        starts = pred if starts is None else np.minimum(starts, pred)
    starts, ends = starts[valid], ends[valid]
    if starts.size == 0:
        return _EMPTY_I64_PAIR
    _, first = np.unique(starts, return_index=True)
    return starts[first], ends[first]


_EMPTY_I64_PAIR = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))


def interval_freqs_keys(keys: list[np.ndarray], n_cand: int, ordered: bool,
                        maxgaps: int | None, maxwidth: int | None,
                        precision: str) -> np.ndarray:
    """Per-candidate interval freq (float64 array; 0.0 = no interval)."""
    starts, ends = (_minimal_ordered(keys) if ordered
                    else _minimal_unordered(keys))
    if starts.size == 0:
        return np.zeros(n_cand, dtype=np.float64)
    min_extent = len(keys)
    lens = (ends - starts + 1).astype(np.int64)  # same rank: pure pos diff
    keep = np.ones(lens.size, dtype=bool)
    if maxwidth is not None:
        keep &= lens <= int(maxwidth)
    if maxgaps is not None:
        keep &= (lens - min_extent) <= int(maxgaps)
    starts, lens = starts[keep], lens[keep]
    if starts.size == 0:
        return np.zeros(n_cand, dtype=np.float64)
    ranks = (starts // _KEY_SHIFT).astype(np.int64)
    contrib = 1.0 / np.maximum(lens - min_extent + 1, 1).astype(np.float64)
    freqs = np.zeros(n_cand, dtype=np.float64)
    # starts ascend → ranks grouped and ascending
    bounds = np.flatnonzero(np.diff(ranks)) + 1
    groups = np.concatenate([[0], bounds, [ranks.size]])
    if precision == "float32":
        # IntervalScorer.java:81-85: float freq += double contribution —
        # narrow to float32 after every addition, in interval order
        for g in range(groups.size - 1):
            lo, hi = groups[g], groups[g + 1]
            acc = np.float32(0.0)
            for c in contrib[lo:hi]:
                acc = np.float32(np.float64(acc) + c)
            freqs[ranks[lo]] = np.float64(acc)
    else:
        sums = np.add.reduceat(contrib, groups[:-1])
        freqs[ranks[groups[:-1]]] = sums
    return freqs


def saturation_scores(freqs: np.ndarray, weight: float, pivot: float,
                      precision: str) -> np.ndarray:
    """``weight · (1 − pivot/(pivot + freq))``
    (IntervalScoreFunction.java:75-80) in the requested float mode."""
    if precision == "float32":
        f = freqs.astype(np.float32)
        w = np.float32(weight)
        p = np.float32(pivot)
        return (w * (np.float32(1.0) - p / (p + f))).astype(np.float64)
    return weight * (1.0 - float(pivot) / (float(pivot) + freqs))
