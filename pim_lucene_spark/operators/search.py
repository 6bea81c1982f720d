"""Batched BM25 phrase/term search over the partitioned index (Q1-Q22).

Query lifecycle (single-pass, Spark-natural re-expression of the
host↔DPU protocol in ``topdocs_sync.c:469-544``):

1. Driver tokenizes the query batch (batching semantics of
   ``PimSystemManager.java:401-437``) and looks up global term stats from
   the index's stats table — the TermStatistics build of
   ``PimPhraseQuery.java:110-132``.  Queries containing a term absent from
   the whole index short-circuit to empty (``PimPhraseQuery.java:122-124``).
2. The postings Parquet is scanned with ``term IN (query terms)`` — pushed
   to the Parquet reader (dictionary + row-group pruning), the analogue of
   the per-DPU term-dictionary lookup (``term_lookup.c:107-222``).
3. Matching posting rows are evaluated in one Arrow-vectorized
   ``applyInPandas`` kernel per partition; the partition's norms blob
   (1 byte/doc) is read directly from the index's ``norms/pid=N/`` Parquet
   layout — a side-data read, never a Spark shuffle (the way a Lucene
   segment reads its own norms file).  Kernel: vectorized varint decode →
   k-way sorted docID intersection (leapfrog semantics, ``matcher.c:
   82-128``) → position alignment counting every overlapping occurrence
   (``matcher.c:133-177``) → BM25 scoring with Lucene's exact float32
   expression tree → per-partition top-k.

   **Block-max pruning** (``score_lower_bound.c:88-122``,
   ``matcher.c:121-128`` semantics):

   - *term queries*: segments are scored in descending order of their
     admissible upper bound ``score(seg_max_tf, best_norm)``; once the
     running k-th best exact score strictly exceeds the next segment's
     bound, the remaining segments are never even *decoded* (classic
     block-max WAND skipping, exact because the bound is computed with the
     identical float expression tree at maximal inputs — float rounding is
     monotone).
   - *phrase queries*: candidates are evaluated in descending upper-bound
     order (ub = score(min term tf, actual norm) — tighter than any
     segment-level bound) with the evaluation cut once the k-th best exact
     score exceeds the next ub; position blobs are decoded **lazily per
     (term, segment) unit** only when a candidate chunk actually touches
     them, so a pruned tail (or a stopword-heavy term) never pays its
     position-decode cost.

4. Global top-k per query: window rank over (score desc, doc_id asc) —
   Lucene ``TopScoreDocCollector`` tie-break order.

Scale notes: only rows for query terms are shuffled (tiny); norms never
shuffle (direct per-pid read).  The final window runs over at most
``P * k`` rows per query.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pim_lucene_spark.functions import bm25
from pim_lucene_spark.functions.postings import (
    decode_columnar,
    decode_positions_slice,
)
from pim_lucene_spark.functions.tokenize import tokenize_one
from pim_lucene_spark.manifest import IndexManifest
from pim_lucene_spark.operators.deletes import live_mask_for
from pim_lucene_spark.sparkutil import (
    cached_parquet,
    local_empty,
    local_result,
    manifest_scan_key,
)

RESULT_SCHEMA = T.StructType([
    T.StructField("qid", T.LongType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("freq", T.LongType(), False),
    T.StructField("norm", T.IntegerType(), False),
    T.StructField("score", T.DoubleType(), False),
])

_POS_KEY_SHIFT = np.int64(1) << np.int64(32)

# per-process decode instrumentation (per-worker in distributed runs;
# authoritative when the kernel is invoked directly — tests/bench use it
# to prove block-max pruning actually skips decode work)
DECODE_STATS = {
    "doc_bytes": 0,      # doc+freq blob bytes decoded
    "pos_bytes": 0,      # position blob bytes decoded
    "pos_units": 0,      # (term, segment) position units decoded
    "segments_scored": 0,    # single-term path: segments decoded+scored
    "segments_skipped": 0,   # single-term path: segments pruned by bound
}


def reset_decode_stats() -> dict:
    snap = dict(DECODE_STATS)
    for k in DECODE_STATS:
        DECODE_STATS[k] = 0
    return snap


class _LazyPostings:
    """One term's partition postings with per-(stripe, segment) lazy
    position decode.

    Doc ids and freqs decode eagerly (they drive intersection and the
    WAND bounds); the position stream of each (stripe, segment) unit is
    sought via the stored skip sizes (``PimIndexWriter.java:903-916``) and
    decoded only when :meth:`ensure_positions` is asked for a candidate
    living inside it.
    """

    __slots__ = ("rel_docs", "freqs", "pos_offsets", "positions",
                 "_u_lo", "_u_hi", "_u_blob", "_u_blo", "_u_bhi", "_u_filled")

    def __init__(self, rows, seg_mask: np.ndarray | None = None):
        rel_parts, freq_parts = [], []
        u_lo, u_blob, u_blo, u_bhi = [], [], [], []
        plo = 0
        for r in rows:  # rows pre-sorted by stripe
            counts = np.asarray(r.seg_doc_counts, dtype=np.int64)
            eff = counts > 0
            if seg_mask is not None:
                eff &= seg_mask
            sel = np.flatnonzero(eff)
            if sel.size == 0:
                continue
            dby = np.asarray(r.seg_doc_bytes, dtype=np.int64)
            fby = np.asarray(r.seg_freq_bytes, dtype=np.int64)
            pby = np.asarray(r.seg_pos_bytes, dtype=np.int64)
            dend, fend, pend = np.cumsum(dby), np.cumsum(fby), np.cumsum(pby)
            doc_b = b"".join(r.doc_blob[dend[i] - dby[i]:dend[i]] for i in sel)
            freq_b = b"".join(r.freq_blob[fend[i] - fby[i]:fend[i]]
                              for i in sel)
            DECODE_STATS["doc_bytes"] += len(doc_b) + len(freq_b)
            tp = decode_columnar(doc_b, freq_b, b"",
                                 np.where(eff, counts, 0),
                                 decode_positions=False)
            rel_parts.append(tp.rel_docs)
            freq_parts.append(tp.freqs)
            for i in sel:
                u_lo.append(plo)
                u_blob.append(r.pos_blob)
                u_blo.append(int(pend[i] - pby[i]))
                u_bhi.append(int(pend[i]))
                plo += int(counts[i])
        if rel_parts:
            self.rel_docs = np.concatenate(rel_parts)
            self.freqs = np.concatenate(freq_parts)
        else:
            self.rel_docs = np.empty(0, dtype=np.int64)
            self.freqs = np.empty(0, dtype=np.int64)
        self.pos_offsets = np.zeros(self.freqs.size + 1, dtype=np.int64)
        np.cumsum(self.freqs, out=self.pos_offsets[1:])
        self.positions: np.ndarray | None = None
        self._u_lo = np.asarray(u_lo, dtype=np.int64)
        self._u_hi = (np.concatenate([self._u_lo[1:], [self.freqs.size]])
                      if u_lo else np.empty(0, dtype=np.int64))
        self._u_blob = u_blob
        self._u_blo = u_blo
        self._u_bhi = u_bhi
        self._u_filled = np.zeros(len(u_lo), dtype=bool)

    def ensure_positions(self, idx: np.ndarray) -> None:
        """Decode the position units containing candidate indices ``idx``."""
        if self.positions is None:
            self.positions = np.zeros(int(self.pos_offsets[-1]),
                                      dtype=np.int64)
        if self._u_lo.size == 0 or idx.size == 0:
            return
        uids = np.unique(np.searchsorted(self._u_lo, idx, side="right") - 1)
        for u in uids:
            if self._u_filled[u]:
                continue
            lo, hi = int(self._u_lo[u]), int(self._u_hi[u])
            blob = self._u_blob[u][self._u_blo[u]:self._u_bhi[u]]
            pos = decode_positions_slice(blob, self.freqs[lo:hi])
            tlo = int(self.pos_offsets[lo])
            self.positions[tlo:tlo + pos.size] = pos
            self._u_filled[u] = True
            DECODE_STATS["pos_bytes"] += len(blob)
            DECODE_STATS["pos_units"] += 1


def _phrase_match_counts(postings_by_term: list, cand_idx_by_term: list[np.ndarray],
                         n_cand: int,
                         offsets: tuple | None = None) -> np.ndarray:
    """Vectorized overlap-counting position alignment.

    For each term i, candidate-doc positions are shifted by -offset_i
    (consecutive ordinals by default; a gapped PhraseQuery — internal
    stop words removed by the ``english`` analyzer — supplies explicit
    ``offsets``) and encoded as ``cand_rank * 2^32 + shifted_pos``;
    successive sorted-array intersections leave one key per aligned
    start position (``matcher.c:133-177`` semantics: every overlapping
    start counts).  Position units are decoded lazily for exactly the
    candidates given.
    """
    keys = None
    for i, (tp, idx) in enumerate(zip(postings_by_term, cand_idx_by_term)):
        tp.ensure_positions(idx)
        starts = tp.pos_offsets[idx]
        ends = tp.pos_offsets[idx + 1]
        lens = ends - starts
        total = int(lens.sum())
        if total == 0:
            return np.zeros(n_cand, dtype=np.int64)
        take = np.arange(total, dtype=np.int64) + np.repeat(starts, lens) \
            - np.repeat(np.cumsum(lens) - lens, lens)
        pos = tp.positions[take] - (i if offsets is None else offsets[i])
        ranks = np.repeat(np.arange(idx.size, dtype=np.int64), lens)
        k = ranks * _POS_KEY_SHIFT + pos
        if i == 0:
            keys = k
        else:
            # both key arrays are sorted ascending (ranks nondecreasing,
            # positions strictly increasing within a doc), so sorted
            # intersection via searchsorted beats isin's concat+argsort
            j = np.searchsorted(k, keys)
            j[j == k.size] = 0  # out-of-range probes can never match …
            keys = keys[k[j] == keys]  # … k[0] != key there (key > max)
            if keys.size == 0:
                return np.zeros(n_cand, dtype=np.int64)
    ranks = (keys // _POS_KEY_SHIFT).astype(np.int64)
    return np.bincount(ranks, minlength=n_cand).astype(np.int64)


# ---------------------------------------------------------------------------
# executor-side warm postings cache — the Spark-native analogue of the
# reference's one-time index load into DPU memory (B15,
# DpuSystemExecutor.java:110-219): a long-lived python worker keeps the
# DECODED postings of hot (build, pid, term) keys across search() calls,
# so a warm query batch skips the decode entirely (the columnar scan is
# already IN-pruned JVM-side).  Per-process LRU with a byte budget; keys
# include the immutable build_id, so a rebuilt index can never serve
# stale postings.  Opt-in via search(postings_cache_mb=...).
# ---------------------------------------------------------------------------
_POSTINGS_CACHE: OrderedDict = OrderedDict()
_POSTINGS_CACHE_STATE = {"bytes": 0, "hits": 0, "misses": 0}


def _lp_bytes(lp: "_LazyPostings") -> int:
    n = lp.rel_docs.nbytes + lp.freqs.nbytes + lp.pos_offsets.nbytes
    if lp.positions is not None:
        n += lp.positions.nbytes
    n += int(sum(hi - lo for lo, hi in zip(lp._u_blo, lp._u_bhi)))
    return n


def _postings_cache_get(key):
    entry = _POSTINGS_CACHE.get(key)
    if entry is not None:
        lp, recorded = entry
        # positions may have been lazily decoded since admission — refresh
        # the accounting so the byte counter never drifts (an eviction
        # subtracting an inflated recomputed size would underflow it and
        # disable the budget for the worker's lifetime)
        size = _lp_bytes(lp)
        if size != recorded:
            _POSTINGS_CACHE_STATE["bytes"] += size - recorded
            _POSTINGS_CACHE[key] = (lp, size)
        _POSTINGS_CACHE.move_to_end(key)
        _POSTINGS_CACHE_STATE["hits"] += 1
        return lp
    _POSTINGS_CACHE_STATE["misses"] += 1
    return None


def _postings_cache_put(key, lp: "_LazyPostings", budget_bytes: int):
    if key in _POSTINGS_CACHE:
        return
    size = _lp_bytes(lp)
    if size > budget_bytes:
        return
    _POSTINGS_CACHE[key] = (lp, size)
    _POSTINGS_CACHE_STATE["bytes"] += size
    while _POSTINGS_CACHE_STATE["bytes"] > budget_bytes and _POSTINGS_CACHE:
        _, (_, old_size) = _POSTINGS_CACHE.popitem(last=False)
        _POSTINGS_CACHE_STATE["bytes"] -= old_size


def postings_cache_stats() -> dict:
    return dict(_POSTINGS_CACHE_STATE, entries=len(_POSTINGS_CACHE))


def clear_postings_cache() -> None:
    _POSTINGS_CACHE.clear()
    _POSTINGS_CACHE_STATE.update(bytes=0, hits=0, misses=0)


def _single_term_topk(rows, norms: np.ndarray, weight: float,
                      cache: np.ndarray, precision: str, k: int,
                      num_segments: int, ext_bound: float = -np.inf,
                      cached: "_LazyPostings | None" = None,
                      cache_put=None, prefer_full_bytes: int = 0,
                      live: np.ndarray | None = None,
                      start_idx: int = 0, doc_budget: int | None = None,
                      after: tuple[float, int] | None = None,
                      doc_stride: tuple[int, int] = (1, 0)):
    """Single-term scoring with block-max segment skipping.

    Segments are visited in descending admissible upper-bound order
    (``ub = score(seg_max_tf, best_norm)``); once k docs are collected and
    the k-th best exact score strictly exceeds the next segment's bound,
    the remaining segments are skipped without decoding a byte — the
    block-max WAND skip of ``score_lower_bound.c:88-122`` /
    ``matcher.c:121-128``, exact because float rounding is monotone so the
    bound computed by the identical expression tree at maximal inputs
    dominates every in-segment score.

    ``cached``/``cache_put`` hook into the batch-wide decode cache: a hot
    term already fully decoded by an earlier query in the batch is scored
    straight from the cached arrays (scoring is cheap; the skip only ever
    saved the decode), and a full decode performed here is published back.
    ``prefer_full_bytes`` > 0 (set when the warm cache is enabled) trades
    the cold block-max skip for residency on terms whose decoded arrays
    fit the hint: decode fully ONCE and publish, so every later batch
    scores from memory — a skip that re-decodes per call is a net loss
    the moment a term repeats.

    ``start_idx``/``doc_budget`` drive the multi-round adaptive bound
    sync (``topdocs_sync.c:469-544``): resume at segment ``start_idx``
    of the deterministic upper-bound order and decode at most
    ``doc_budget`` docs this round.  Returns a 5th element
    ``(next_idx, remaining, rem_ub)`` — the resume point, whether
    segments are left, and the best upper bound among them (the driver
    relaunches only pairs whose ``rem_ub`` can still beat the global
    k-th best).

    ``after`` = ``(after_score, after_global_doc)`` implements Lucene's
    ``IndexSearcher.searchAfter`` paging: only hits STRICTLY after that
    mark in (score desc, doc asc) order qualify.  Non-qualifying hits
    are dropped before they enter the running top-k buffer, so the
    block-max skip stays exact — a segment's upper bound still
    dominates every qualifying score inside it.  ``doc_stride`` =
    ``(P, pid)`` maps partition-relative docs to global ids for the
    tie-break comparison.
    """
    counts_tot = np.zeros(num_segments, dtype=np.int64)
    max_tf = np.zeros(num_segments, dtype=np.int64)
    for r in rows:
        counts_tot += np.asarray(r.seg_doc_counts, dtype=np.int64)
        max_tf = np.maximum(max_tf, np.asarray(r.seg_max_tf, dtype=np.int64))
    total = int(counts_tot.sum())
    if cached is None and prefer_full_bytes and 16 * total <= \
            prefer_full_bytes:
        total_hint = -1  # force the full-decode (cache-publishing) path
    else:
        total_hint = total
    if cached is not None or (k >= total_hint and ext_bound == -np.inf):
        lp = cached if cached is not None else _LazyPostings(rows)
        if cached is None and cache_put is not None:
            cache_put(lp)
        cand, freqs = lp.rel_docs, lp.freqs
        if live is not None:  # mask deleted docs before scoring
            keep = live[cand]
            cand, freqs = cand[keep], freqs[keep]
        nb = norms[cand]
        sc = bm25.score(freqs, nb, weight, cache, precision)
        DECODE_STATS["segments_scored"] += int((counts_tot > 0).sum())
        return (cand, freqs, nb, np.asarray(sc, dtype=np.float64),
                (0, False, -np.inf))

    best_byte = int(np.argmax(cache))
    seg_live = np.flatnonzero(counts_tot > 0)
    ub = np.asarray(bm25.score(max_tf[seg_live],
                               np.full(seg_live.size, best_byte,
                                       dtype=np.int64),
                               weight, cache, precision), dtype=np.float64)
    o = np.argsort(-ub, kind="stable")
    order, ub_sorted = seg_live[o], ub[o]

    parts: list[tuple] = []
    top_buf = np.empty(0, dtype=np.float64)  # running top-k (O(batch + k))
    n_coll, kth, i = 0, -np.inf, int(start_idx)
    state = (0, False, -np.inf)  # (next_idx, remaining, rem_ub)
    docs_decoded = 0
    batch_target = max(4 * k, 256)
    while i < order.size:
        # ext_bound is an achieved global k-th-best lower bound (the
        # host-side bound broadcast of topdocs_sync.c:469-544): admissible
        # to apply before k local docs are collected
        if ub_sorted[i] < ext_bound or (n_coll >= k and ub_sorted[i] < kth):
            DECODE_STATS["segments_skipped"] += int(order.size - i)
            break
        if doc_budget is not None and docs_decoded >= doc_budget:
            # round budget spent with work left: report the resume point
            # and the best remaining upper bound to the driver sync loop
            state = (int(i), True, float(ub_sorted[i]))
            break
        j, exp = i, 0
        while j < order.size and (j == i or exp < batch_target):
            exp += int(counts_tot[order[j]])
            j += 1
        mask = np.zeros(num_segments, dtype=bool)
        mask[order[i:j]] = True
        lp = _LazyPostings(rows, mask)
        cand_b, freqs_b = lp.rel_docs, lp.freqs
        if live is not None:  # deleted docs must not occupy the bound
            keep = live[cand_b]
            cand_b, freqs_b = cand_b[keep], freqs_b[keep]
        nb = norms[cand_b]
        sc = np.asarray(bm25.score(freqs_b, nb, weight, cache, precision),
                        dtype=np.float64)
        if after is not None and cand_b.size:
            # searchAfter: drop hits at-or-before the page mark so they
            # never occupy the running top-k (the skip bound must be the
            # k-th QUALIFYING score)
            s_a, d_a = after
            g = cand_b * doc_stride[0] + doc_stride[1]
            qm = (sc < s_a) | ((sc == s_a) & (g > d_a))
            cand_b, freqs_b, nb, sc = (cand_b[qm], freqs_b[qm], nb[qm],
                                       sc[qm])
        parts.append((cand_b, freqs_b, nb, sc))
        n_coll += cand_b.size
        docs_decoded += exp
        DECODE_STATS["segments_scored"] += int(j - i)
        top_buf = np.concatenate([top_buf, sc])
        if top_buf.size > k:
            top_buf = np.partition(top_buf, -k)[-k:]
        if n_coll >= k:
            kth = float(top_buf.min())
        i = j
    if not parts:
        z = np.empty(0, dtype=np.int64)
        return (z, z, z.astype(np.uint8), np.empty(0, dtype=np.float64),
                state)
    cand = np.concatenate([p[0] for p in parts])
    freqs = np.concatenate([p[1] for p in parts])
    nb = np.concatenate([p[2] for p in parts])
    scores = np.concatenate([p[3] for p in parts])
    return cand, freqs, nb, scores, state


def _assemble_by_term(postings_pdf: pd.DataFrame) -> dict[str, list]:
    """Reassemble striped postings rows per term in stripe order (hot
    terms are striped across rows — skew bound,
    ``IndexConfig.max_postings_per_stripe``)."""
    by_term: dict[str, list] = {}
    for row in postings_pdf.itertuples(index=False):
        by_term.setdefault(row.term, []).append(row)
    for rows in by_term.values():
        rows.sort(key=lambda r: r.stripe)
    return by_term


class _DecodeCtx:
    """Per-(partition, batch) decode cache shared by the search and
    compound kernels.

    Full decodes are cached across the query batch (repeated hot terms
    decode once) and, when the warm cache is enabled, across batches in
    the process-wide LRU; co-presence-masked decodes are query-specific.
    Positions stay lazy either way.
    """

    __slots__ = ("by_term", "decoded", "pid", "ckey", "budget")

    def __init__(self, by_term: dict[str, list], payload: dict, pid: int,
                 ckey=None):
        self.by_term = by_term
        self.decoded: dict[str, _LazyPostings] = {}
        self.pid = pid
        self.ckey = ckey if ckey is not None else payload.get("cache_key")
        self.budget = int(payload.get("postings_cache_mb", 0)) * (1 << 20)

    def probe(self, term) -> "_LazyPostings | None":
        tp = self.decoded.get(term)
        if tp is None and self.budget:
            tp = _postings_cache_get((self.ckey, self.pid, term))
            if tp is not None:
                self.decoded[term] = tp
        return tp

    def publish(self, term, tp: "_LazyPostings") -> None:
        self.decoded[term] = tp
        if self.budget:
            _postings_cache_put((self.ckey, self.pid, term), tp,
                                self.budget)

    def get(self, term, seg_mask=None) -> "_LazyPostings":
        tp = self.probe(term)
        if tp is None and seg_mask is not None and self.budget:
            # warm cache on: a masked decode is query-specific and
            # re-done every batch — prefer one cacheable full decode for
            # modest terms (same residency tradeoff as the single-term
            # prefer_full path)
            est = 16 * sum(int(np.asarray(r.seg_doc_counts,
                                          dtype=np.int64).sum())
                           for r in self.by_term[term])
            if est <= self.budget // 8:
                seg_mask = None
        if tp is None and seg_mask is not None:
            # no full decode available: decode only the co-present
            # segments (query-specific, not published)
            return _LazyPostings(self.by_term[term], seg_mask)
        if tp is None:
            tp = _LazyPostings(self.by_term[term])
            self.publish(term, tp)
        # an already-decoded superset is always valid: masked-out
        # segments hold docs that cannot survive the intersection
        return tp


def _match_core(payload: dict, pid: int, postings_pdf: pd.DataFrame | None,
                norms: np.ndarray,
                by_term: dict[str, list] | None = None,
                live: np.ndarray | None = None) -> pd.DataFrame:
    """Pandas adapter over :func:`_match_core_arrays` (the Spark
    ``applyInPandas`` kernels need a frame; the serving path skips the
    per-pid frame construction and concatenates raw arrays)."""
    arrays = _match_core_arrays(payload, pid, postings_pdf, norms,
                                by_term=by_term, live=live)
    if arrays is None:
        return _empty_result()
    return pd.DataFrame(arrays)


def _match_core_arrays(payload: dict, pid: int,
                       postings_pdf: pd.DataFrame | None,
                       norms: np.ndarray,
                       by_term: dict[str, list] | None = None,
                       live: np.ndarray | None = None) -> dict | None:
    out_qid, out_doc, out_freq, out_norm, out_score = [], [], [], [], []
    P = payload["num_partitions"]
    k = payload["k"]
    precision = payload["precision"]
    cache = payload["cache"]
    num_segments = payload["num_segments"]

    if by_term is None:
        # (the serving path passes prebuilt, resident structures)
        by_term = _assemble_by_term(postings_pdf)
    ctx = _DecodeCtx(by_term, payload, pid)
    cache_budget = ctx.budget
    _probe_cached = ctx.probe
    _publish = ctx.publish
    get_decoded = ctx.get

    bounds = payload.get("bounds") or {}
    after_all = payload.get("after") or {}
    offsets_all = payload.get("offsets") or {}
    # multi-round adaptive bound sync (topdocs_sync.c:469-544): the
    # driver passes a per-round doc budget + per-(qid, pid) resume
    # indices; the kernel reports progress back through STATE rows
    # (norm -1 = budget spent with work left, -2 = exhausted; doc_id =
    # pid, freq = resume index, score = best remaining upper bound)
    sync = payload.get("sync")
    budget = int(sync["budget"]) if sync else None
    progress = sync.get("progress", {}) if sync else {}
    sync_round = int(sync.get("round", 0)) if sync else 0
    st_qid, st_idx, st_norm, st_ub = [], [], [], []
    for qid, terms, weight in payload["queries"]:
        start_idx = 0
        if sync:
            mine = progress.get(qid, {}).get(pid)
            if sync_round > 0:
                if mine is None:  # not relaunched: this pair is done
                    continue
                start_idx = int(mine)
        if any(t not in by_term for t in terms):
            continue  # this partition lacks a term → no hits here
        uniq = list(dict.fromkeys(terms))
        multi = len(terms) > 1
        ext = float(bounds.get(qid, -np.inf))
        aft = after_all.get(qid)

        if not multi:
            t0 = terms[0]
            cand, freqs, norm_bytes, scores, st = _single_term_topk(
                by_term[t0], norms, weight, cache, precision, k,
                num_segments, ext_bound=ext,
                cached=_probe_cached(t0),
                cache_put=lambda lp, _t=t0: _publish(_t, lp),
                prefer_full_bytes=cache_budget // 8, live=live,
                start_idx=start_idx, doc_budget=budget,
                after=aft, doc_stride=(P, pid))
            if sync and st[1]:  # budget spent with segments left
                st_qid.append(qid)
                st_idx.append(st[0])
                st_norm.append(-1)
                st_ub.append(st[2])
            if cand.size == 0:
                continue
        else:
            # co-presence prune: a phrase can only match in segments
            # where EVERY term has postings (dpu.c:204-207 semantics)
            pres = None
            for t in uniq:
                p = None
                for r in by_term[t]:
                    c = np.asarray(r.seg_doc_counts) > 0
                    p = c if p is None else (p | c)
                pres = p if pres is None else (pres & p)
            if not pres.any():
                continue
            seg_mask = None if pres.all() else pres
            tps = [get_decoded(t, seg_mask) for t in uniq]

            # k-way sorted docID intersection (leapfrog semantics)
            cand = tps[0].rel_docs
            idxs = [np.arange(cand.size)]
            for tp in tps[1:]:
                cand, ia, ib = np.intersect1d(cand, tp.rel_docs,
                                              assume_unique=True,
                                              return_indices=True)
                idxs = [ix[ia] for ix in idxs] + [ib]
                if cand.size == 0:
                    break
            if live is not None and cand.size:
                keep = live[cand]  # deleted docs leave the candidate set
                cand = cand[keep]  # before any WAND bound accumulates
                idxs = [ix[keep] for ix in idxs]
            if cand.size == 0:
                continue

            tfs = np.stack([tp.freqs[ix] for tp, ix in zip(tps, idxs)])
            norm_bytes = norms[cand]

            # WAND-style cut: evaluate candidates in descending
            # admissible upper bound order (phrase freq <= min term tf,
            # score monotone in freq — score_lower_bound.c:88-122);
            # positions decode lazily per evaluated chunk
            ub_freq = tfs.min(axis=0)
            ub = bm25.score(ub_freq, norm_bytes, weight, cache, precision)
            order = np.argsort(-ub.astype(np.float64), kind="stable")
            term_order = [uniq.index(t) for t in terms]
            freqs = np.zeros(cand.size, dtype=np.int64)
            scores = np.full(cand.size, -np.inf)
            chunk = max(4 * k, 256)
            n_scored = 0
            kth_best = -np.inf
            # searchAfter: the k-th-best cut must track QUALIFYING hits
            # only (a pre-mark hit can never be emitted, so letting it
            # tighten the cut would prune real page hits)
            qual_buf = np.empty(0, dtype=np.float64)
            # phrases are exempt from the round budget: the doc-id
            # decode behind the intersection would repeat every round
            # (kernel tasks are stateless across jobs), overwhelming the
            # position-work saving — a phrase pair completes in its
            # first round (it never emits a state row, so it is never
            # relaunched); the sync loop's doc budget is the reference's
            # per-term topdocs path
            for start in range(0, order.size, chunk):
                sel = order[start:start + chunk]
                # strict <: an unevaluated candidate with exact == kth
                # could still win the doc_id-asc tie-break.  ext is the
                # broadcast global bound — admissible immediately.
                cut = float(ub[sel[0]])
                if cut < ext or (n_scored >= k and cut < kth_best):
                    break  # no remaining candidate can beat the k-th
                sub_counts = _phrase_match_counts(
                    [tps[j] for j in term_order],
                    [idxs[j][sel] for j in term_order],
                    sel.size, offsets=offsets_all.get(qid))
                freqs[sel] = sub_counts
                hit = sub_counts > 0
                if hit.any():
                    sc = bm25.score(sub_counts[hit], norm_bytes[sel][hit],
                                    weight, cache, precision)
                    scf = sc.astype(np.float64)
                    scores[sel[hit]] = scf
                    if aft is None:
                        n_scored += int(hit.sum())
                        pos_scores = scores[scores > -np.inf]
                        if pos_scores.size >= k:
                            kth_best = float(
                                np.partition(pos_scores, -k)[-k])
                    else:
                        s_a, d_a = aft
                        g = cand[sel[hit]] * P + pid
                        qm = (scf < s_a) | ((scf == s_a) & (g > d_a))
                        n_scored += int(qm.sum())
                        qual_buf = np.concatenate([qual_buf, scf[qm]])
                        if qual_buf.size > k:
                            qual_buf = np.partition(qual_buf, -k)[-k:]
                        if n_scored >= k:
                            kth_best = float(qual_buf.min())

        hit = freqs > 0
        if not hit.any():
            continue
        h_doc = cand[hit] * P + pid
        h_freq = freqs[hit]
        h_norm = norm_bytes[hit]
        h_score = np.asarray(scores)[hit].astype(np.float64)
        if aft is not None:
            # searchAfter page filter: strictly after the mark in
            # (score desc, doc asc) order.  Idempotent with the in-loop
            # masks above; also covers the no-prune full-decode paths.
            s_a, d_a = aft
            qm = (h_score < s_a) | ((h_score == s_a) & (h_doc > d_a))
            if not qm.any():
                continue
            h_doc, h_freq = h_doc[qm], h_freq[qm]
            h_norm, h_score = h_norm[qm], h_score[qm]
        # per-partition top-k (score desc, doc asc) to bound shuffle size
        if h_doc.size > k:
            ord_local = np.lexsort((h_doc, -h_score))[:k]
        else:
            ord_local = np.lexsort((h_doc, -h_score))
        out_qid.append(np.full(ord_local.size, qid, dtype=np.int64))
        out_doc.append(h_doc[ord_local])
        out_freq.append(h_freq[ord_local])
        out_norm.append(h_norm[ord_local].astype(np.int32))
        out_score.append(h_score[ord_local])

    if st_qid:  # sync-mode state rows (norm -1): doc_id=pid, freq=resume
        out_qid.append(np.asarray(st_qid, dtype=np.int64))
        out_doc.append(np.full(len(st_qid), pid, dtype=np.int64))
        out_freq.append(np.asarray(st_idx, dtype=np.int64))
        out_norm.append(np.asarray(st_norm, dtype=np.int32))
        out_score.append(np.asarray(st_ub, dtype=np.float64))
    if not out_qid:
        return None
    return {
        "qid": np.concatenate(out_qid),
        "doc_id": np.concatenate(out_doc),
        "freq": np.concatenate(out_freq),
        "norm": np.concatenate(out_norm).astype(np.int32),
        "score": np.concatenate(out_score),
    }


_EMPTY_RESULT: pd.DataFrame | None = None


def _empty_result() -> pd.DataFrame:
    """Typed empty result frame — one cached instance (treat as
    immutable).  Serving profile: constructing this per no-hit partition
    was ~48% of warm ``search_local`` time (pandas dict_to_mgr + astype
    cost ~3 ms per empty frame × ~10 empty pids per query)."""
    global _EMPTY_RESULT
    if _EMPTY_RESULT is None:
        _EMPTY_RESULT = pd.DataFrame({"qid": [], "doc_id": [], "freq": [],
                                      "norm": [], "score": []}).astype(
            {"qid": np.int64, "doc_id": np.int64, "freq": np.int64,
             "norm": np.int32, "score": np.float64})
    return _EMPTY_RESULT


def _resolve_norms_access(norms_access: str, manifest) -> str:
    """'auto' → 'direct' only for a plain filesystem path the driver can
    stat; scheme-qualified URIs (s3a://, hdfs://) and driver-invisible
    dirs fall back to the always-working cogroup instead of failing at
    query time inside an executor."""
    if norms_access != "auto":
        return norms_access
    if "://" not in manifest.norms_path and \
            os.path.isdir(manifest.norms_path):
        return "direct"
    return "cogroup"


def _match_kernel(payload: dict):
    """Per-partition kernel; norms come from a direct per-pid Parquet read
    (``payload['norms_path']``) or, as a fallback, a cogrouped frame."""
    norms_path = payload.get("norms_path")

    if norms_path is not None:
        def fn(key, postings_pdf: pd.DataFrame) -> pd.DataFrame:
            pid = int(key[0])
            if len(postings_pdf) == 0:
                return _empty_result()
            part_dir = os.path.join(norms_path, f"pid={pid}")
            if not os.path.isdir(part_dir):
                # a pid with postings always has docs, hence norms — a
                # missing dir is a misconfiguration (unmounted index path,
                # object-store URI): fail loudly, never return empty hits
                raise FileNotFoundError(
                    f"norms partition {part_dir} not visible from this "
                    "executor; direct norms access needs a POSIX-visible "
                    "shared mount — use search(norms_access='cogroup') "
                    "for object stores or non-shared layouts")
            import pyarrow.parquet as pq
            blob = pq.read_table(part_dir, columns=["norms"]) \
                .column("norms")[0].as_py()
            norms = np.frombuffer(blob, dtype=np.uint8)
            live = live_mask_for(payload.get("deletes_path"), pid,
                                 payload["num_partitions"], norms.size)
            return _match_core(payload, pid, postings_pdf, norms,
                               live=live)
        return fn

    def fn(key, postings_pdf: pd.DataFrame,
           norms_pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        if len(postings_pdf) == 0 or len(norms_pdf) == 0:
            return _empty_result()
        norms = np.frombuffer(norms_pdf.iloc[0]["norms"], dtype=np.uint8)
        live = live_mask_for(payload.get("deletes_path"), pid,
                             payload["num_partitions"], norms.size)
        return _match_core(payload, pid, postings_pdf, norms, live=live)
    return fn


def _match_kernel_map(payload: dict):
    """``mapInPandas`` form of the direct-norms kernel.

    The default ``groupBy(pid).applyInPandas`` plan works, but AQE
    coalesces its tiny shuffle to ONE post-shuffle task, serializing
    every pid's kernel (and norms read) behind a single Python worker —
    measured 450 ms vs 255 ms per query at sf0.1 (fresh plan per call,
    quiet machine).  Instead the caller hash-repartitions by ``pid``
    into an explicitly chosen task count (explicit ``repartition(n,
    col)`` is user-specified partitioning, which AQE never coalesces),
    and this kernel re-groups whole pid groups from the task's batches —
    co-location is guaranteed by the hash exchange, so results are
    identical to the per-group form (differential-tested).
    """
    def fn(it):
        parts = [pdf for pdf in it if len(pdf)]
        if not parts:
            return
        allp = (pd.concat(parts, ignore_index=True)
                if len(parts) > 1 else parts[0])
        yield from _iter_pid_results(payload, allp)
    return fn


def _iter_pid_results(payload: dict, allp: pd.DataFrame):
    """Run the direct-norms match kernel over every whole pid group in
    ``allp`` (shared by the exchange-fed and file-fed kernel forms)."""
    import pyarrow.parquet as pq
    norms_path = payload["norms_path"]
    for pid, grp in allp.groupby("pid", sort=True):
        pid = int(pid)
        part_dir = os.path.join(norms_path, f"pid={pid}")
        if not os.path.isdir(part_dir):
            # same loud contract as _match_kernel's direct path
            raise FileNotFoundError(
                f"norms partition {part_dir} not visible from this "
                "executor; direct norms access needs a POSIX-visible "
                "shared mount — use search(norms_access='cogroup') "
                "for object stores or non-shared layouts")
        blob = pq.read_table(part_dir, columns=["norms"]) \
            .column("norms")[0].as_py()
        norms = np.frombuffer(blob, dtype=np.uint8)
        live = live_mask_for(payload.get("deletes_path"), pid,
                             payload["num_partitions"], norms.size)
        out = _match_core(payload, pid, grp, norms, live=live)
        if len(out):
            yield out


def _match_kernel_files(payload: dict):
    """Single-stage kernel: each task reads its ASSIGNED postings files
    directly with pyarrow ``term IN`` pushdown and runs the per-pid match
    kernel — no Exchange at all (guide §2.4 / §8.4 "co-locate instead of
    join": the postings Parquet is already laid out by pid, so the
    repartition-by-pid shuffle only re-creates a grouping the files
    already have).  The driver's file plan (:func:`_postings_file_groups`)
    guarantees every pid's rows live in exactly one task, which is the
    same co-location contract the hash exchange gave; the kernel itself
    is identical, so results are identical (differential-tested).

    This is the distributed twin of the serving path's pyarrow read
    (``_local_rows``) and the reference's DPU model: each task owns its
    shard and reads it locally.  Needs POSIX-visible index files from
    every executor — exactly the precondition of direct norms access,
    which gates this plan.
    """
    groups = payload["file_groups"]
    terms = list(payload["needed_terms"])

    def fn(it):
        import pyarrow as pa
        import pyarrow.parquet as pq
        for pdf in it:
            for gi in pdf["id"]:
                files, pids = groups[int(gi)]
                filters = [("term", "in", terms), ("pid", "in", pids)]
                tables = []
                for f in files:
                    t = pq.read_table(f, filters=filters)
                    if t.num_rows:
                        tables.append(t)
                if not tables:
                    continue
                allp = (pa.concat_tables(tables) if len(tables) > 1
                        else tables[0]).to_pandas()
                yield from _iter_pid_results(payload, allp)
    return fn


def _local_route_max() -> int:
    """Postings-volume ceiling for the in-process query route.

    If a query batch's total postings volume (Σ doc_freq over its
    terms) does not exceed what ONE kernel task is sized to handle, a
    distributed job cannot run faster than a single task — and that one
    task would still pay the full Python-stage job overhead (~170-250 ms
    measured on this host for an *identity* mapInPandas job, vs
    single-digit ms of actual kernel work).  Below the ceiling the
    driver runs that one task's kernel in-process instead — the exact
    job the cluster would have executed, minus the scheduler (and the
    reference engine's own query path is host-resident for the same
    reason).  The ceiling is volume-derived (the same one-task target
    the task-count heuristic uses), not core-count-derived; 0 disables
    the route entirely.  Measured break-evens on this host class
    (quiet): a single hot-term query still wins inline at Σdf = 500k
    (284 vs 485 ms) and loses by Σdf = 1M (1466 vs 592 ms), but a
    20-phrase batch at Σdf = 108k already loses (570-890 ms inline vs
    ~330 ms distributed — per-posting work grows with query count), so
    the default stays at the conservative single-task budget rather
    than the single-query crossover."""
    v = os.environ.get("SPARK_GRAFT_LOCAL_ROUTE_POSTINGS")
    if v is not None:
        return int(v)
    return int(os.environ.get("SPARK_GRAFT_POSTINGS_PER_TASK",
                              str(1 << 16)))


def _chunks_posix(manifest: IndexManifest) -> bool:
    """True when every postings chunk dir is a driver-visible plain
    filesystem path (the same precondition direct norms access has)."""
    for c in range(manifest.build_chunks):
        p = manifest.chunk_path(c)
        if "://" in p or not os.path.isdir(p):
            return False
    return True


def _search_inline(manifest: IndexManifest, payload: dict,
                   needed_terms) -> pd.DataFrame:
    """One-task kernel run in-process: pyarrow ``term IN`` read of the
    postings chunks (no residency caches — every call re-reads Parquet;
    the decode cache obeys ``payload['postings_cache_mb']`` exactly as a
    kernel task would), then the identical per-pid match kernel.  The
    hit pids' norms blobs come from ONE filtered read of the norms
    dataset (per-pid directory reads cost a dataset discovery each)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    filters = [("term", "in", list(needed_terms))]
    tables = [pq.read_table(manifest.chunk_path(c), filters=filters)
              for c in range(manifest.build_chunks)]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return _empty_result()
    allp = (pa.concat_tables(tables) if len(tables) > 1
            else tables[0]).to_pandas()
    hit_pids = sorted(int(p) for p in allp["pid"].unique())
    ntbl = pq.read_table(payload["norms_path"],
                         filters=[("pid", "in", hit_pids)],
                         columns=["pid", "norms"])
    norms_by_pid: dict[int, np.ndarray] = {}
    for p, b in zip(ntbl.column("pid").to_pylist(),
                    ntbl.column("norms").to_pylist()):
        # one blob row per pid; keep the first like the kernels'
        # ``column("norms")[0]`` read
        norms_by_pid.setdefault(int(p), np.frombuffer(b, dtype=np.uint8))
    outs = []
    for pid, grp in allp.groupby("pid", sort=True):
        pid = int(pid)
        norms = norms_by_pid.get(pid)
        if norms is None:
            # a pid with postings always has docs, hence norms — same
            # loud contract as the kernels' direct path
            raise FileNotFoundError(
                f"norms partition pid={pid} missing under "
                f"{payload['norms_path']}")
        live = live_mask_for(payload.get("deletes_path"), pid,
                             payload["num_partitions"], norms.size)
        out = _match_core(payload, pid, grp, norms, live=live)
        if len(out):
            outs.append(out)
    if not outs:
        return _empty_result()
    return pd.concat(outs, ignore_index=True) if len(outs) > 1 else outs[0]


def _kernel_task_count(num_partitions: int, total_postings: int) -> int:
    """Scale-adaptive kernel parallelism (guide §2: derive partitioning
    from input size, not a constant).

    ``total_postings`` = Σ doc_freq over the query batch's terms (known
    from the stats lookup — no extra job): the upper bound on posting
    rows the scan can emit.  One task per ~64k postings keeps per-task
    decode work (a few MB, tens of ms) comfortably above the ~5-10 ms
    task-launch cost; a small floor overlaps the per-pid norms reads
    even for tiny queries; the cap is one task per index partition (a
    pid is the indivisible kernel unit).  Env-overridable for cluster
    tuning; the defaults are size-derived, not core-count-derived.
    """
    target = int(os.environ.get("SPARK_GRAFT_POSTINGS_PER_TASK",
                                str(1 << 16)))
    floor = int(os.environ.get("SPARK_GRAFT_KERNEL_TASK_FLOOR", "8"))
    want = max(floor, -(-int(total_postings) // max(target, 1)))
    return max(1, min(int(num_partitions), want))


# postings pid→files map per index generation: which Parquet files hold
# each pid's rows (exact, from the RLE/dictionary-encoded pid column) —
# lets the kernel job skip the repartition exchange entirely by handing
# each task a pid subset plus the files that contain it, read with
# ``pid IN`` + ``term IN`` pyarrow pushdown.  Keyed like the scan cache
# (identity + dir mtimes); bounded.
_FILE_PLAN_CACHE: OrderedDict[tuple, dict | None] = OrderedDict()
_FILE_PLAN_CACHE_MAX = 64


def _postings_pid_map(manifest: IndexManifest) -> dict | None:
    """``{pid: (est_bytes, [files...])}`` from a one-time scan of each
    chunk file's pid column (tiny: RLE/dictionary pages), or ``None``
    when the layout can't be inspected (URI paths, unreadable files) —
    the caller then falls back to the exchange plan.  Cached per
    (build, mtimes); no postings data is touched, and the weights are
    driver-side planning estimates only (file bytes split evenly over
    the file's pids)."""
    from pim_lucene_spark.sparkutil import _paths_token
    paths = tuple(manifest.chunk_path(c)
                  for c in range(manifest.build_chunks))
    token = _paths_token(paths)
    if token is None:
        return None
    key = (manifest_scan_key(manifest), paths, token)
    if key in _FILE_PLAN_CACHE:
        _FILE_PLAN_CACHE.move_to_end(key)
        return _FILE_PLAN_CACHE[key]
    import pyarrow.parquet as pq
    pid_map: dict[int, tuple[float, list[str]]] | None = {}
    try:
        for d in paths:
            for name in sorted(os.listdir(d)):
                if not name.endswith(".parquet"):
                    continue
                f = os.path.join(d, name)
                pids = np.unique(pq.read_table(f, columns=["pid"])
                                 .column("pid").to_numpy())
                if pids.size == 0:
                    continue  # empty part file: no pids to own
                w = os.path.getsize(f) / pids.size
                for p in pids.tolist():
                    old_w, old_files = pid_map.get(int(p), (0.0, []))
                    pid_map[int(p)] = (old_w + w, old_files + [f])
    except (OSError, KeyError, ValueError):
        pid_map = None
    if not pid_map:
        pid_map = None
    _FILE_PLAN_CACHE[key] = pid_map
    while len(_FILE_PLAN_CACHE) > _FILE_PLAN_CACHE_MAX:
        _FILE_PLAN_CACHE.popitem(last=False)
    return pid_map


def _postings_file_groups(manifest: IndexManifest, n_tasks: int
                          ) -> list[tuple[list[str], list[int]]] | None:
    """Bin-pack pids into ``n_tasks`` task groups (LPT greedy on the
    per-pid byte estimate — a better balance than the hash exchange's
    modulo placement).  Each group is ``(files, pids)``: the task reads
    those files with ``pid IN pids`` (+ ``term IN``) pushdown, so a pid
    is owned by exactly ONE task no matter how the writer laid out the
    files.  ``None`` → use the exchange plan."""
    pid_map = _postings_pid_map(manifest)
    if not pid_map:
        return None
    n = max(1, min(int(n_tasks), len(pid_map)))
    bins: list[list] = [[0.0, [], set()] for _ in range(n)]
    for pid, (w, files) in sorted(pid_map.items(),
                                  key=lambda kv: (-kv[1][0], kv[0])):
        tgt = min(bins, key=lambda b: b[0])
        tgt[0] += w
        tgt[1].append(pid)
        tgt[2].update(files)
    return [(sorted(fs), pids) for _, pids, fs in bins if pids]


# term → doc_freq cache per index generation (0 = negative entry).  The
# reference caches scoring stats per query batch (PimPhraseScoreStats);
# we additionally reuse them across batches — repeated hot terms skip the
# stats-lookup job entirely.  Keyed by the manifest's build_id (a rebuilt
# index in the same directory gets a new id and never serves stale stats);
# LRU-bounded so dead indexes don't leak for the process lifetime.
_TERM_STATS_CACHE: OrderedDict[tuple, dict[str, int]] = OrderedDict()
_TERM_STATS_CACHE_MAX = 64
# index generations whose FULL stats table is cached (small indexes only:
# one job warms every term and later misses are true df=0 negatives)
_TERM_STATS_FULL: set[tuple] = set()
_FULL_STATS_MAX_BYTES = 8 << 20  # gate: never bulk-load a big stats table


def _stats_table_bytes(path: str) -> int | None:
    """Cheap driver-side size probe of the stats Parquet dir (local/shared
    FS only — returns None where listing fails, falling back to the
    filtered per-term read)."""
    try:
        sizes = [os.path.getsize(os.path.join(path, f))
                 for f in os.listdir(path) if f.endswith(".parquet")]
    except OSError:
        return None
    # zero parquet files == unknown layout, NOT an empty table — never let
    # a non-standard layout pass the "small table" gate
    return sum(sizes) if sizes else None


def _stats_cache_key(m: IndexManifest) -> tuple:
    return (m.build_id or m.index_dir, m.doc_count, m.sum_total_term_freq,
            m.norm_quant_factor)


def _normalize_queries(queries) -> list[tuple[int, str, float]]:
    """Accept ``(qid, text)`` or ``(qid, text, boost)`` tuples."""
    out = []
    for q in queries:
        if len(q) == 2:
            out.append((q[0], q[1], 1.0))
        else:
            out.append((q[0], q[1], float(q[2])))
    return out


def _tokenize_queries_full(norm_queries: list[tuple[int, str, float]],
                           tokenizer: str
                           ) -> dict[int, tuple[list, tuple | None, float]]:
    """Analyze a whole query batch in ONE vectorized pass →
    ``{qid: (terms, offsets | None, boost)}``.

    Per-query ``tokenize_one`` re-runs the analyzer pipeline (and, for
    ``standard``, ~15 Arrow regex compilations) per string — measured
    ~20 ms/query, which made driver-side planning the bottleneck of the
    1036-query reference batch.  One batched call amortizes it.

    ``offsets`` is non-None only when a stop-filtering analyzer
    (``english``) removed INTERNAL tokens: Lucene's ``QueryBuilder``
    keeps position increments, so the phrase "sort the window" becomes
    a gapped PhraseQuery — sort@x, window@x+2.  Offsets are normalized
    to start at 0 (a leading gap only shifts the match start).
    """
    texts = pd.Series([t for _, t, _ in norm_queries], dtype=object)
    if tokenizer != "english":
        from pim_lucene_spark.functions.tokenize import tokenize_series
        toks = tokenize_series(texts, tokenizer)
        return {qid: (list(ts), None, boost)
                for (qid, _, boost), ts in zip(norm_queries, toks)}
    from pim_lucene_spark.functions.tokenize import (gap_offsets,
                                                      tokenize_to_codes)
    doc_idx, codes, pos, uniq = tokenize_to_codes(texts, tokenizer)
    bounds = np.searchsorted(doc_idx, np.arange(len(norm_queries) + 1))
    out = {}
    for row, (qid, _, boost) in enumerate(norm_queries):
        lo, hi = bounds[row], bounds[row + 1]
        ts = [uniq[c] for c in codes[lo:hi]]
        out[qid] = (ts, gap_offsets(pos[lo:hi]), boost)
    return out


def _tokenize_queries(norm_queries: list[tuple[int, str, float]],
                      tokenizer: str) -> dict[int, tuple[list[str], float]]:
    """Back-compat shape ``{qid: (terms, boost)}`` (no gap offsets)."""
    return {qid: (ts, boost) for qid, (ts, _, boost)
            in _tokenize_queries_full(norm_queries, tokenizer).items()}


def plan_queries(spark: SparkSession, manifest: IndexManifest,
                 queries: list[tuple], k: int,
                 precision: str,
                 collect_offsets: dict | None = None
                 ) -> tuple[list, list[str]]:
    """Driver-side scoring-stats build (Q2) + no-match short-circuit (Q3).

    ``queries`` are ``(qid, text)`` or ``(qid, text, boost)``; boost
    scales the weight exactly as Lucene's ``BoostQuery``
    (``weight = boost * Σidf`` in float32, ``BM25Similarity.java:236``).

    ``collect_offsets``: a dict the caller supplies to receive
    ``{qid: gap offsets}`` for queries whose analysis removed internal
    stop words (``english`` analyzer) — the kernel aligns phrase terms
    at those offsets instead of consecutive positions (Lucene
    QueryBuilder gapped-PhraseQuery semantics).
    """
    norm_queries = _normalize_queries(queries)
    term_lists = _tokenize_queries_full(norm_queries, manifest.tokenizer)
    all_terms = sorted({t for ts, _, _ in term_lists.values() for t in ts})
    if not all_terms:
        return [], []
    cache = term_doc_freqs(spark, manifest, all_terms)
    doc_freq = {t: cache[t] for t in all_terms if cache[t] > 0}
    planned = []
    for qid, (terms, offs, boost) in term_lists.items():
        if not terms or any(t not in doc_freq for t in terms):
            continue  # Q3: constant-zero weight
        dfs = np.array([doc_freq[t] for t in terms], dtype=np.int64)
        weight = bm25.phrase_weight(dfs, manifest.doc_count,
                                    boost=boost, precision=precision)
        planned.append((qid, tuple(terms), float(weight)))
        if collect_offsets is not None and offs is not None:
            collect_offsets[qid] = offs
    needed_terms = sorted({t for _, ts, _ in planned for t in ts})
    return planned, needed_terms


def term_doc_freqs(spark: SparkSession | None, manifest: IndexManifest,
                   all_terms: list[str]) -> dict[str, int]:
    """doc_freq per exact term (0 for absent), via the cross-batch stats
    cache — pyarrow pushdown when ``spark`` is None (serving path).
    Terms are index terms, NOT analyzed text (``SynonymQuery`` and
    expansion callers pass post-analysis terms)."""
    key = _stats_cache_key(manifest)
    cache = _TERM_STATS_CACHE.setdefault(key, {})
    _TERM_STATS_CACHE.move_to_end(key)
    while len(_TERM_STATS_CACHE) > _TERM_STATS_CACHE_MAX:
        old_key, _ = _TERM_STATS_CACHE.popitem(last=False)
        _TERM_STATS_FULL.discard(old_key)
    missing = [t for t in all_terms if t not in cache]
    if missing and key in _TERM_STATS_FULL:
        for t in missing:  # full table cached → misses are df=0
            cache[t] = 0
        missing = []
    if missing:
        size = _stats_table_bytes(manifest.stats_path)
        if size is not None and size <= _FULL_STATS_MAX_BYTES:
            # small index: warm EVERY term in one pass so later queries in
            # this process never pay a stats lookup again
            if spark is None:
                import pyarrow.parquet as pq
                tbl = pq.read_table(manifest.stats_path,
                                    columns=["term", "doc_freq"])
                cache.update(zip(tbl.column("term").to_pylist(),
                                 (int(x) for x in
                                  tbl.column("doc_freq").to_pylist())))
            else:
                rows = (spark.read.parquet(manifest.stats_path)
                        .select("term", "doc_freq").collect())
                cache.update({r["term"]: int(r["doc_freq"]) for r in rows})
            _TERM_STATS_FULL.add(key)
            for t in missing:
                cache.setdefault(t, 0)
        else:
            if spark is None:
                import pyarrow.parquet as pq
                tbl = pq.read_table(manifest.stats_path,
                                    columns=["term", "doc_freq"],
                                    filters=[("term", "in", missing)])
                found = dict(zip(tbl.column("term").to_pylist(),
                                 (int(x) for x in
                                  tbl.column("doc_freq").to_pylist())))
            else:
                stats = (spark.read.parquet(manifest.stats_path)
                         .filter(F.col("term").isin(missing))
                         .collect())
                found = {r["term"]: int(r["doc_freq"]) for r in stats}
            for t in missing:
                cache[t] = found.get(t, 0)
    return {t: cache[t] for t in all_terms}


def _search_sync_rounds(spark, postings, payload: dict, k: int,
                        budget0: int = 4096) -> DataFrame:
    """Multi-round adaptive bound sync — the reference's iterative
    host/DPU loop (``topdocs_sync.c:469-544``, constants
    ``topdocs_sync.h:24-28``) re-expressed as successive bounded Spark
    jobs:

    round r: every live (query, partition) pair resumes its
    deterministic upper-bound traversal with a doc budget of
    ``budget0 * 2**r``; the kernel emits its round-local top-k plus one
    STATE row per unfinished pair (resume index + best remaining upper
    bound).  The driver folds all results into per-query k-heaps,
    tightens each query's global k-th-best bound, and relaunches ONLY
    the pairs whose remaining upper bound can still beat it (strict <,
    because a tie can win the doc-id-asc tie-break) with the bound
    broadcast as ``ext_bound``.  Rounds end when no pair remains.

    Exact: every emitted doc is exactly scored, the bound is achieved
    (k docs already hold it), and skipped work is provably below it —
    identical results to the single-pass plan, differential-tested.
    Decode bytes drop on hot terms because round ≥ 2 starts from a
    globally tightened bound instead of one partition's sample.

    The per-(query, partition) resume index in ``progress`` is also the
    query-side early-exit/context-restore protocol (Q15 —
    ``dpu.c:679-722``, ``context_save_restore.c:17-68``): a budget-hit
    pair saves exactly where its deterministic traversal stopped and
    the next launch resumes there; the build side's chunk markers are
    the same protocol for indexing.
    """
    progress: dict = {}     # qid -> {pid: resume_idx}; round-0 empty
    bounds: dict = {}
    acc = None
    budget = max(int(budget0), 16)
    rnd = 0
    while True:
        payload_r = dict(payload, bounds=bounds,
                         sync={"budget": budget, "progress": progress,
                               "round": rnd})
        scan = postings
        if rnd > 0:
            live_pids = sorted({p for m in progress.values() for p in m})
            scan = postings.filter(F.col("pid").isin(live_pids))
        pdf = (scan.groupBy("pid")
               .applyInPandas(_match_kernel(payload_r), RESULT_SCHEMA)
               .toPandas())
        state = pdf[pdf["norm"] < 0]
        res = pdf[pdf["norm"] >= 0]
        acc = res if acc is None else pd.concat([acc, res],
                                                ignore_index=True)
        if len(acc):
            acc = (acc.sort_values(["qid", "score", "doc_id"],
                                   ascending=[True, False, True])
                   .groupby("qid", sort=False).head(k)
                   .reset_index(drop=True))
        bounds = {int(qid): float(grp["score"].min())
                  for qid, grp in acc.groupby("qid")
                  if len(grp) >= k}
        progress = {}
        for row in state.itertuples(index=False):
            qid = int(row.qid)
            b = bounds.get(qid)
            # strict <: a remaining doc tying the k-th could still win
            if b is None or float(row.score) >= b:
                progress.setdefault(qid, {})[int(row.doc_id)] = \
                    int(row.freq)
        if not progress:
            break
        budget *= 2
        rnd += 1
    return local_result(
        spark, acc if acc is not None and len(acc) else _empty_result(),
        RESULT_SCHEMA)


def search(spark: SparkSession, index: IndexManifest | str,
           queries: list[tuple[int, str]], k: int | None = 10,
           precision: str = "float32",
           final_merge: str = "window",
           norms_access: str = "auto",
           bound_probe=False,
           postings_cache_mb: int = 0,
           sync_budget0: int = 4096,
           after: dict[int, tuple[float, int]] | None = None) -> DataFrame:
    """Batched top-k phrase/term search → DataFrame(qid, doc_id, freq, norm, score).

    ``precision='float32'`` reproduces Lucene's float expression tree
    (scores returned as their exact float64 upcast); ``'float64'`` runs the
    same tree in doubles (ANSI-SQL reproducible).

    ``final_merge``: ``'window'`` (default) keeps the global top-k as a
    rank window in the plan; ``'driver'`` collects the per-partition
    top-k rows (≤ P·k per query — tiny) and heap-merges on the driver,
    the reference's host-side merge (``topdocs_sync.c:369-412``) — one
    exchange less, lower latency for small k.

    ``norms_access``: ``'direct'`` has each partition task read its norms
    blob straight from the index's ``norms/pid=N/`` Parquet files —
    requires a POSIX-visible shared mount (local disk, NFS, Lustre,
    FUSE-mounted object store); a task that cannot see its norms dir fails
    loudly.  ``'cogroup'`` shuffles norms through a Spark cogroup instead
    (raw object-store URIs, v2 indexes, exotic deployments).  ``'auto'``
    (default) picks ``direct`` only when the norms path is a plain
    filesystem path the driver can stat (a scheme-qualified URI like
    ``s3a://…`` or a dir the driver can't see falls back to ``cogroup``
    instead of failing at query time; executors that still can't see a
    driver-visible path get the loud error as the backstop).

    ``bound_probe``: the reference's adaptive bound broadcast
    (``topdocs_sync.c:469-544``: the host pushes the running global k-th
    best to every DPU between rounds).  ``True`` = the one-shot probe —
    a job over ONE partition yields an achieved k-th-best score per
    query (round-robin doc routing makes any partition a uniform
    sample), broadcast into the full job where every kernel starts its
    WAND / block-max cut at that bound instead of -inf.  ``"sync"`` =
    the full iterative loop (:func:`_search_sync_rounds`): doubling doc
    budgets (``sync_budget0 * 2**round``), per-round driver k-heap
    merge, tightened-bound rebroadcast, and relaunch of only the
    (query, partition) pairs that can still contribute — disabled at
    k >= 1000 exactly like the reference.  Both are admissible (k docs
    already achieve every broadcast bound) and return identical results
    (differential-tested).

    ``postings_cache_mb`` > 0 enables the per-worker warm postings cache
    (the B15 index-load-to-PIM analogue): decoded postings of hot
    (build, pid, term) keys survive across search() calls in long-lived
    python workers, bounded by the byte budget.  Identical results; pure
    decode-work save on warm batches.

    ``after`` implements Lucene ``IndexSearcher.searchAfter`` paging:
    ``{qid: (after_score, after_doc_id)}`` — the last hit of the
    previous page per query (pass the score EXACTLY as returned, the
    tie-break comparison is float-exact).  Each query returns its next
    ``k`` hits strictly after that mark in (score desc, doc asc) order.
    The mark is filtered INSIDE the kernel before the per-partition
    top-k cut (deep paging never widens the exchange: page N ships the
    same ≤ P·k rows as page 1), and both pruning paths count only
    qualifying hits toward their cut, so block-max skipping stays
    exact.  Queries absent from the dict start at page 1.

    ``k=None`` returns EVERY match with no per-partition cut and no
    global rank window — the contract for clause-frame and exhaustive-
    union consumers (boolean join plan, combined-field exhaustive plan,
    count paths).  The per-qid window would otherwise sort a query's
    entire match set on one task; unbounded consumers aggregate or join
    the frame downstream, so the order is noise they must not pay for.
    """
    unbounded = k is None
    if unbounded:
        # internal sentinel: the kernel's per-partition cut and pruning
        # thresholds are inert above any real match count
        k = 10 ** 9
    manifest = IndexManifest.load(index) if isinstance(index, str) else index
    gap_offsets: dict = {}
    planned, needed_terms = plan_queries(spark, manifest, queries, k,
                                         precision,
                                         collect_offsets=gap_offsets)
    if not planned:
        return local_empty(spark, RESULT_SCHEMA)

    avgdl = bm25.avg_field_length(manifest.sum_total_term_freq,
                                  manifest.doc_count, precision)
    norms_access = _resolve_norms_access(norms_access, manifest)
    use_direct = norms_access == "direct" and manifest.version >= 3
    payload = {
        "queries": planned,
        "k": int(k),
        "precision": precision,
        "cache": bm25.score_cache(avgdl, manifest.k1, manifest.b, precision),
        "num_partitions": manifest.num_partitions,
        "num_segments": manifest.num_segments,
        "norms_path": manifest.norms_path if use_direct else None,
        # v1/v2 manifests have no build_id — mix in content-derived stats
        # (as _stats_cache_key does) so an in-place rebuild of a legacy
        # index cannot serve stale decoded postings from warm workers
        "cache_key": (manifest.build_id or manifest.index_dir,
                      manifest.doc_count, manifest.sum_total_term_freq),
        "postings_cache_mb": int(postings_cache_mb),
        "deletes_path": (manifest.deletes_path if manifest.delete_gen
                         else None),
    }
    if after:
        payload["after"] = {int(q): (float(s), int(d))
                            for q, (s, d) in after.items()}
    if gap_offsets:
        payload["offsets"] = gap_offsets

    if use_direct and not bound_probe:
        total_df = sum(term_doc_freqs(spark, manifest,
                                      list(needed_terms)).values())
        if 0 < total_df <= _local_route_max() and _chunks_posix(manifest):
            # one-task-sized query: run the kernel in-process (the job
            # the cluster would run, minus the scheduler — see
            # _local_route_max); identical results, differential-tested
            pdf = _search_inline(manifest, payload, needed_terms)
            if not unbounded and len(pdf):
                pdf = (pdf.sort_values(["qid", "score", "doc_id"],
                                       ascending=[True, False, True])
                       .groupby("qid", sort=True).head(k))
            return local_result(spark, pdf, RESULT_SCHEMA)

    postings = (cached_parquet(spark, manifest_scan_key(manifest),
                               *[manifest.chunk_path(c) for c in
                                 range(manifest.build_chunks)])
                .filter(F.col("term").isin(list(needed_terms))))

    if bound_probe == "sync" and use_direct and k < 1000:
        # the reference's full iterative loop (topdocs_sync.c:469-544):
        # per-round doc budgets (doubling), per-partition best scores →
        # driver k-heaps → tightened bound broadcast → relaunch of only
        # the (query, partition) pairs whose remaining upper bound can
        # still beat the global k-th best; off at k >= 1000 exactly like
        # the reference.  A Spark round costs ~0.1 s vs a DPU round's
        # microseconds, so the initial budget is scaled up
        # (sync_budget0) — the protocol, not the constant, is the
        # faithful part.
        return _search_sync_rounds(spark, postings, payload, k,
                                   budget0=int(sync_budget0))

    if bound_probe and use_direct and manifest.num_partitions > 1:
        probe = (postings.filter(F.col("pid") == 0).groupBy("pid")
                 .applyInPandas(_match_kernel(payload), RESULT_SCHEMA)
                 .toPandas())
        bounds = {}
        for qid, grp in probe.groupby("qid"):
            sc = grp["score"].to_numpy()
            if sc.size >= k:  # bound valid only when k docs achieve it
                bounds[int(qid)] = float(np.sort(sc)[-k])
        if bounds:
            payload = dict(payload, bounds=bounds)

    if use_direct:
        dfs = term_doc_freqs(spark, manifest, list(needed_terms))
        n_tasks = _kernel_task_count(manifest.num_partitions,
                                     sum(dfs.values()))
        groups = (None if os.environ.get("SPARK_GRAFT_DIRECT_SCAN") == "0"
                  else _postings_file_groups(manifest, n_tasks))
        if groups is not None:
            # zero-Exchange single-stage job: tasks read their assigned
            # pid-complete postings files directly (guide §2.4; the
            # repartition below only re-creates the grouping the file
            # layout already has)
            payload = dict(payload, file_groups=groups,
                           needed_terms=list(needed_terms))
            per_part = (spark.range(0, len(groups), 1, len(groups))
                        .mapInPandas(_match_kernel_files(payload),
                                     RESULT_SCHEMA))
        else:
            per_part = (postings.repartition(n_tasks, "pid")
                        .mapInPandas(_match_kernel_map(payload),
                                     RESULT_SCHEMA))
    else:
        norms = cached_parquet(spark, manifest_scan_key(manifest),
                               manifest.norms_path)
        per_part = (postings.groupBy("pid")
                    .cogroup(norms.groupBy("pid"))
                    .applyInPandas(_match_kernel(payload), RESULT_SCHEMA))

    if unbounded:
        return per_part

    if final_merge == "driver":
        pdf = per_part.toPandas()
        if len(pdf):
            pdf = (pdf.sort_values(["qid", "score", "doc_id"],
                                   ascending=[True, False, True])
                   .groupby("qid", sort=True).head(k))
        return local_result(spark, pdf, RESULT_SCHEMA)

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (per_part
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .drop("rank"))


def page_marks(page: pd.DataFrame) -> dict[int, tuple[float, int]]:
    """Per-query ``(score, doc_id)`` of the LAST hit in a result page —
    the ``after`` argument for fetching the next page
    (``IndexSearcher.searchAfter``'s ``ScoreDoc`` mark).  Accepts the
    pandas form of any search result (``df.toPandas()`` or the serving
    path's frame); queries with no hits are absent (their pages are
    exhausted)."""
    marks: dict[int, tuple[float, int]] = {}
    if len(page) == 0:
        return marks
    for qid, grp in page.groupby("qid"):
        tail = grp.sort_values(["score", "doc_id"],
                               ascending=[False, True]).iloc[-1]
        marks[int(qid)] = (float(tail["score"]), int(tail["doc_id"]))
    return marks


def search_term(spark: SparkSession, index: IndexManifest | str, term: str,
                k: int | None = None,
                precision: str = "float32") -> DataFrame:
    """Single-term query (Q22) — free by-product of the phrase path.

    ``k=None`` (the default) returns the FULL match set **unordered**
    (no global rank window — consumers aggregate or sort downstream);
    pass a numeric ``k`` for the globally ordered top-k of earlier
    releases.  ``model.search_term`` keeps a large numeric default for
    the sorted behavior."""
    return search(spark, index, [(0, term)], k=k, precision=precision)


# serving-path residency: raw postings rows per (index, term) and norms
# blobs per (index, pid) stay in-process, so a warm query touches no
# files at all — the full analogue of the reference's loaded index
_LOCAL_ROWS: OrderedDict = OrderedDict()
_LOCAL_ROWS_STATE = {"bytes": 0}
_LOCAL_ROWS_MAX = 512 << 20
_LOCAL_NORMS: dict = {}


def _local_rows(manifest, ckey, terms: list[str],
                pids: list[int] | None = None) -> dict[int, dict]:
    """Resident ``{pid: {term: [stripe-ordered rows]}}`` for the serving
    path — built once per term from a pyarrow pushdown read, then pure
    dict assembly per call (no pandas iteration on the hot path).

    ``pids`` restricts the read AND the residency to a pid subset (the
    sharded server gives each worker process its own subset, so a shard
    never reads or caches another shard's rows — ``pid IN`` joins the
    pushdown next to ``term IN``).
    """
    import pyarrow.parquet as pq
    # pid subset is part of the residency key — a process serving shard A
    # then shard B (or a fork inheriting the parent's full-range cache)
    # must not answer B's reads from A's rows
    ckey = (ckey, tuple(sorted(int(p) for p in pids))
            if pids is not None else None)
    missing = [t for t in terms if (ckey, t) not in _LOCAL_ROWS]
    if missing:
        filters = [("term", "in", missing)]
        if pids is not None:
            filters.append(("pid", "in", [int(p) for p in pids]))
        parts = [pq.read_table(manifest.chunk_path(c),
                               filters=filters).to_pandas()
                 for c in range(manifest.build_chunks)]
        pdf = pd.concat(parts, ignore_index=True)
        size_per = (int(pdf.memory_usage(deep=True).sum()) // max(len(pdf), 1)
                    if len(pdf) else 0)
        grouped: dict[str, dict[int, list]] = {t: {} for t in missing}
        for row in pdf.itertuples(index=False):
            grouped.setdefault(row.term, {}).setdefault(
                int(row.pid), []).append(row)
        for t in missing:
            by_pid = grouped.get(t, {})
            n_rows = 0
            for rows in by_pid.values():
                rows.sort(key=lambda r: r.stripe)
                n_rows += len(rows)
            size = max(n_rows, 1) * max(size_per, 1)
            _LOCAL_ROWS[(ckey, t)] = (by_pid, size)
            _LOCAL_ROWS_STATE["bytes"] += size
    # assemble the result BEFORE any eviction, pinning this batch's keys:
    # a budget-driven LRU pass must never evict a term the CURRENT batch
    # needs (just-loaded or previously resident) — the kernel treats a
    # missing term as "no hits on this partition", which would silently
    # return partial results
    out: dict[int, dict] = {}
    current = set()
    for t in terms:
        entry = _LOCAL_ROWS.get((ckey, t))
        if entry is None:
            # plan_queries dropped df=0 terms, so every requested term
            # was either resident or just loaded — anything else is a
            # bookkeeping bug: fail loudly, never serve partial results
            raise RuntimeError(
                f"serving-path residency lost term {t!r} mid-batch")
        current.add((ckey, t))
        _LOCAL_ROWS.move_to_end((ckey, t))
        for pid, rows in entry[0].items():
            out.setdefault(pid, {})[t] = rows
    while _LOCAL_ROWS_STATE["bytes"] > _LOCAL_ROWS_MAX:
        victim = next((key for key in _LOCAL_ROWS if key not in current),
                      None)
        if victim is None:
            break  # only the pinned batch remains — over budget is fine
        _, old = _LOCAL_ROWS.pop(victim)
        _LOCAL_ROWS_STATE["bytes"] -= old
    return out


def _local_norms(manifest, ckey, pid: int) -> np.ndarray:
    key = (ckey, pid)
    norms = _LOCAL_NORMS.get(key)
    if norms is None:
        import pyarrow.parquet as pq
        blob = pq.read_table(os.path.join(manifest.norms_path,
                                          f"pid={pid}"),
                             columns=["norms"]).column("norms")[0].as_py()
        norms = np.frombuffer(blob, dtype=np.uint8)
        _LOCAL_NORMS[key] = norms
    return norms


_LOCAL_LIVE: dict = {}


def _local_live(manifest, ckey, pid: int,
                n_docs: int) -> np.ndarray | None:
    """Resident per-pid live mask for the serving path, keyed by the
    delete generation so a new ``delete_docs`` call invalidates it;
    superseded generations' masks are dropped on load (a long-lived
    server with periodic deletes must not accumulate one mask set per
    generation)."""
    if not manifest.delete_gen:
        return None
    key = (ckey, manifest.delete_gen, pid)
    if key not in _LOCAL_LIVE:
        for old in [k for k in _LOCAL_LIVE
                    if k[0] == ckey and k[1] < manifest.delete_gen]:
            del _LOCAL_LIVE[old]
        _LOCAL_LIVE[key] = live_mask_for(
            manifest.deletes_path, pid, manifest.num_partitions, n_docs)
    return _LOCAL_LIVE[key]


def clear_local_cache() -> None:
    _LOCAL_ROWS.clear()
    _LOCAL_ROWS_STATE["bytes"] = 0
    _LOCAL_NORMS.clear()
    _LOCAL_LIVE.clear()


def search_local(index: IndexManifest | str, queries: list[tuple[int, str]],
                 k: int = 10, precision: str = "float32",
                 postings_cache_mb: int = 256,
                 pids: list[int] | None = None,
                 after: dict[int, tuple[float, int]] | None = None
                 ) -> pd.DataFrame:
    """Serving-path search: the SAME kernel, no Spark job.

    The reference's query path never schedules batch work — queries go to
    an index RESIDENT in accelerator memory and results come back in
    milliseconds (``PimSystemManager.java:401-437``).  This is that
    serving path for a POSIX-visible index: term-stats and postings read
    via pyarrow with ``term IN`` predicate pushdown (same row-group
    pruning the distributed scan gets), per-pid norms blobs read directly,
    the identical ``_match_core`` kernel run in-process per partition,
    and a driver heap-merge — plus the warm postings cache, which in a
    single process hits on every repeated term.  Use for interactive /
    low-latency serving; use :func:`search` for cluster-scale batches.
    Results are identical (differential-tested); returns a pandas frame
    ``(qid, doc_id, freq, norm, score)``.

    ``after`` = ``{qid: (after_score, after_doc_id)}`` pages past the
    previous page's last hit (Lucene ``searchAfter``), same semantics
    as :func:`search`.
    """
    manifest = IndexManifest.load(index) if isinstance(index, str) else index
    gap_offsets: dict = {}
    planned, needed_terms = plan_queries(None, manifest, queries, k,
                                         precision,
                                         collect_offsets=gap_offsets)
    if not planned:
        # public API boundary: hand out a copy, never the shared cached
        # frame (a caller mutating its result must not poison every
        # later empty result in the process)
        return _empty_result().copy()
    avgdl = bm25.avg_field_length(manifest.sum_total_term_freq,
                                  manifest.doc_count, precision)
    payload = {
        "queries": planned,
        "k": int(k),
        "precision": precision,
        "cache": bm25.score_cache(avgdl, manifest.k1, manifest.b, precision),
        "num_partitions": manifest.num_partitions,
        "num_segments": manifest.num_segments,
        "norms_path": manifest.norms_path,
        "cache_key": (manifest.build_id or manifest.index_dir,
                      manifest.doc_count, manifest.sum_total_term_freq),
        "postings_cache_mb": int(postings_cache_mb),
        "deletes_path": (manifest.deletes_path if manifest.delete_gen
                         else None),
    }
    if after:
        payload["after"] = {int(q): (float(s), int(d))
                            for q, (s, d) in after.items()}
    if gap_offsets:
        payload["offsets"] = gap_offsets
    ckey = payload["cache_key"]
    by_pid = _local_rows(manifest, ckey, list(needed_terms), pids=pids)
    outs = []
    for pid in sorted(by_pid):
        norms = _local_norms(manifest, ckey, int(pid))
        live = _local_live(manifest, ckey, int(pid), norms.size)
        arrays = _match_core_arrays(payload, int(pid), None, norms,
                                    by_term=by_pid[pid], live=live)
        if arrays is not None:
            outs.append(arrays)
    if not outs:
        return _empty_result().copy()  # public boundary: see above
    # one frame for the whole batch (per-pid pandas construction was the
    # next-biggest serving cost after the empty-frame fix)
    res = pd.DataFrame({c: (np.concatenate([p[c] for p in outs])
                            if len(outs) > 1 else outs[0][c])
                        for c in ("qid", "doc_id", "freq", "norm", "score")})
    return (res.sort_values(["qid", "score", "doc_id"],
                            ascending=[True, False, True])
            .groupby("qid", sort=True).head(k).reset_index(drop=True))
