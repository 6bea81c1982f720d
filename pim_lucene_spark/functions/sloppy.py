"""Sloppy phrase matching with Lucene ``SloppyPhraseMatcher`` semantics.

The reference routes every ``slop != 0`` phrase to the CPU Lucene path
(``PimPhraseQuery.java:74-88`` rewrites to a plain ``PhraseQuery``), whose
scorer enumerates matches with a greedy priority-queue traversal over
per-term position iterators (``SloppyPhraseMatcher.java:174-206``) and
accumulates ``freq += 1/(1 + matchLength)`` per match
(``SloppyPhraseMatcher.java:169-171``).  This module re-expresses exactly
that traversal per document:

- one ``PhrasePositions`` cursor per query offset; ``position`` is the
  *adjusted* position ``raw - offset`` (``PhrasePositions.java:60-68``)
- the queue orders by ``(position, offset, ord)`` (``PhraseQueue.java:27-40``)
- ``end`` is the largest adjusted position ever seen in the doc
  (``SloppyPhraseMatcher.java:270-279``)
- repeated query terms form repeat groups sorted by offset; at init the
  j-th member of a group is advanced j extra times
  (``SloppyPhraseMatcher.java:435-467``), and after any advance of a group
  member, collisions (two members on the same token occurrence) are
  resolved by advancing the *lesser* of the pair by ``(position, offset)``
  (``SloppyPhraseMatcher.java:286-331``)

The greedy traversal is intentionally order-sensitive (it may count
"a b c"~4 and "c b a"~4 differently — the class javadoc documents this);
score identity with Lucene, not an idealized match enumeration, is the
contract here.

Used by the brute-force fallback (:mod:`pim_lucene_spark.plans.router`)
and mirrored in SQL by :func:`pim_lucene_spark.oracle.lucene_sloppy_sql`'s
recursive-CTE state machine for the DuckDB differential oracle.
"""

from __future__ import annotations

import numpy as np


class _PP:
    """One phrase-position cursor (PhrasePositions.java:38-57)."""

    __slots__ = ("ps", "offset", "ord", "i", "n", "position", "grp")

    def __init__(self, ps, offset: int, ord_: int):
        self.ps = ps                # sorted raw positions of this term
        self.offset = offset        # position in the phrase
        self.ord = ord_
        self.i = 0
        self.n = len(ps)
        self.position = 0           # adjusted: raw - offset
        self.grp = -1               # repeat-group id, -1 = non-repeating

    def next_position(self) -> bool:
        if self.i < self.n:
            self.position = int(self.ps[self.i]) - self.offset
            self.i += 1
            return True
        return False


def _pq_key(pp: _PP):
    return (pp.position, pp.offset, pp.ord)


def sloppy_doc_freq(pos_lists: list[np.ndarray], term_keys: list,
                    slop: int) -> float:
    """Per-doc sloppy phrase frequency, Lucene-identical.

    ``pos_lists[i]`` holds the sorted raw token positions of the query term
    at phrase offset ``i`` (repeated terms pass equal lists); ``term_keys``
    identifies which offsets share a term.  Returns ``Σ 1/(1+matchLength)``
    over the matches the greedy pq traversal emits (0.0 when the doc does
    not match, including insufficient occurrences of a repeated term).
    """
    n = len(pos_lists)
    if n == 0 or any(len(p) == 0 for p in pos_lists):
        return 0.0
    if n == 1:
        # single-term phrase: every occurrence is a matchLength-0 match
        return float(len(pos_lists[0]))
    pps = [_PP(pos_lists[i], i, i) for i in range(n)]

    by_term: dict = {}
    for pp, key in zip(pps, term_keys):
        by_term.setdefault(key, []).append(pp)   # offset order preserved
    rpt_groups = [g for g in by_term.values() if len(g) > 1]
    for gi, g in enumerate(rpt_groups):
        for pp in g:
            pp.grp = gi
    has_rpts = bool(rpt_groups)

    # placeFirstPositions + advanceRepeatGroups (init, non-multi-term case:
    # the j-th group member is advanced j times past its first position)
    for pp in pps:
        if not pp.next_position():
            return 0.0
    for g in rpt_groups:
        for j in range(1, len(g)):
            for _ in range(j):
                if not g[j].next_position():
                    return 0.0   # PPs exhausted -> no match in this doc

    end = max(pp.position for pp in pps)

    def advance(pp: _PP) -> bool:
        nonlocal end
        if not pp.next_position():
            return False
        if pp.position > end:
            end = pp.position
        return True

    def collide(pp: _PP) -> _PP | None:
        tp = pp.position + pp.offset
        for pp2 in rpt_groups[pp.grp]:
            if pp2 is not pp and pp2.position + pp2.offset == tp:
                return pp2
        return None

    def advance_rpts(pp: _PP) -> bool:
        # resolve the (single possible) collision chain by advancing the
        # lesser of the colliding pair each round
        if pp.grp < 0:
            return True
        while True:
            pp2 = collide(pp)
            if pp2 is None:
                return True
            if (pp2.position, pp2.offset) < (pp.position, pp.offset):
                pp = pp2
            if not advance(pp):
                return False

    # the nextMatch loop, flattened across successive calls: pop the min
    # cursor, advance it while it stays at-or-below the runner-up
    # (minimizing matchLength), emit a match when it jumps past
    pq = list(pps)
    pp = min(pq, key=_pq_key)
    pq.remove(pp)
    match_len = end - pp.position
    nxt = min(q.position for q in pq)
    freq = 0.0
    while True:
        if not advance(pp) or (has_rpts and not advance_rpts(pp)):
            if match_len <= slop:
                freq += 1.0 / (1.0 + match_len)
            return freq
        if pp.position > nxt:
            pq.append(pp)
            if match_len <= slop:
                freq += 1.0 / (1.0 + match_len)
            pp = min(pq, key=_pq_key)
            pq.remove(pp)
            nxt = min(q.position for q in pq)
            match_len = end - pp.position
        else:
            m2 = end - pp.position
            if m2 < match_len:
                match_len = m2


def sloppy_freqs_batch(doc_idx: np.ndarray, codes: np.ndarray,
                       pos: np.ndarray, tcodes: list[int], slop: int):
    """Batch driver over tokenized docs: ``(local_doc_rows, float_freqs)``.

    ``doc_idx/codes/pos`` are the flat tokenize output (doc-major, position
    order within each doc); ``tcodes`` the query's term codes per offset
    (repeats allowed).  Candidate docs (those containing every distinct
    term) are found vectorized; the per-doc traversal runs the exact
    matcher.  Only docs with freq > 0 are returned.
    """
    per_term: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    cand = None
    for c in dict.fromkeys(tcodes):      # distinct, stable order
        m = codes == c
        d, p = doc_idx[m], pos[m]
        per_term[c] = (d, p)
        u = np.unique(d)
        cand = u if cand is None else np.intersect1d(cand, u,
                                                     assume_unique=True)
        if cand.size == 0:
            break
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    if cand is None or cand.size == 0:
        return empty
    rows, freqs = [], []
    for doc in cand:
        pls = []
        for c in tcodes:
            d, p = per_term[c]
            lo = np.searchsorted(d, doc, "left")
            hi = np.searchsorted(d, doc, "right")
            pls.append(p[lo:hi])
        f = sloppy_doc_freq(pls, tcodes, slop)
        if f > 0.0:
            rows.append(int(doc))
            freqs.append(f)
    if not rows:
        return empty
    return np.asarray(rows, dtype=np.int64), np.asarray(freqs,
                                                        dtype=np.float64)


def sloppy_freqs_postings(postings_by_term: list, cand_idx_by_term: list,
                          n_cand: int, term_keys: list,
                          slop: int) -> np.ndarray:
    """Per-candidate sloppy freqs from INDEX postings (no tokenize scan).

    ``postings_by_term[i]`` is the ``_LazyPostings`` of the query term at
    phrase offset ``i`` (repeated terms pass the same object);
    ``cand_idx_by_term[i]`` that term's candidate indices (one per
    candidate doc, candidates = docs containing every term).  Positions
    decode lazily for exactly the candidates' units — the stored streams
    are the same raw token positions the scan path re-tokenizes, so
    :func:`sloppy_doc_freq` emits the identical Lucene traversal.
    Returns one float64 freq per candidate (0.0 = no match).
    """
    seen: set[int] = set()
    for tp, idx in zip(postings_by_term, cand_idx_by_term):
        if id(tp) not in seen:
            tp.ensure_positions(idx)
            seen.add(id(tp))
    freqs = np.zeros(n_cand, dtype=np.float64)
    for j in range(n_cand):
        pls = []
        for tp, idx in zip(postings_by_term, cand_idx_by_term):
            i = int(idx[j])
            pls.append(tp.positions[tp.pos_offsets[i]:tp.pos_offsets[i + 1]])
        freqs[j] = sloppy_doc_freq(pls, term_keys, slop)
    return freqs
