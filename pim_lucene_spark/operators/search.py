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
3. Matching posting rows are cogrouped with the norms table by partition
   id and evaluated in one Arrow-vectorized ``applyInPandas`` kernel per
   partition: vectorized varint decode → k-way sorted docID intersection
   (leapfrog semantics, ``matcher.c:82-128``) → position alignment counting
   every overlapping occurrence (``matcher.c:133-177``) → BM25 scoring with
   Lucene's exact float32 expression tree → per-partition top-k with a
   WAND-style candidate cut: candidates are processed in descending
   upper-bound order (ub = score(min term tf, norm), the admissible bound
   of ``score_lower_bound.c:88-122``) and evaluation stops once the k-th
   best exact score exceeds the next upper bound.
4. Global top-k per query: window rank over (score desc, doc_id asc) —
   Lucene ``TopScoreDocCollector`` tie-break order.

Scale notes: only rows for query terms are shuffled (tiny); the norms side
is 1 byte/doc.  Both sides hash-partition on ``pid`` so the cogroup is a
co-partitioned zip at 1000-executor scale.  The final window runs over at
most ``P * k`` rows per query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pim_lucene_spark.functions import bm25
from pim_lucene_spark.functions.postings import (
    TermPostings,
    decode_columnar,
    slice_segments,
)
from pim_lucene_spark.functions.tokenize import tokenize_one
from pim_lucene_spark.manifest import IndexManifest

RESULT_SCHEMA = T.StructType([
    T.StructField("qid", T.LongType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("freq", T.LongType(), False),
    T.StructField("norm", T.IntegerType(), False),
    T.StructField("score", T.DoubleType(), False),
])

_POS_KEY_SHIFT = np.int64(1) << np.int64(32)


def _phrase_match_counts(postings_by_term: list, cand_idx_by_term: list[np.ndarray],
                         n_cand: int) -> np.ndarray:
    """Vectorized overlap-counting position alignment.

    For each term i, candidate-doc positions are shifted by -i and encoded
    as ``cand_rank * 2^32 + shifted_pos``; successive sorted-array
    intersections leave one key per aligned start position
    (``matcher.c:133-177`` semantics: every overlapping start counts).
    """
    keys = None
    for i, (tp, idx) in enumerate(zip(postings_by_term, cand_idx_by_term)):
        starts = tp.pos_offsets[idx]
        ends = tp.pos_offsets[idx + 1]
        lens = ends - starts
        total = int(lens.sum())
        if total == 0:
            return np.zeros(n_cand, dtype=np.int64)
        take = np.arange(total, dtype=np.int64) + np.repeat(starts, lens) \
            - np.repeat(np.cumsum(lens) - lens, lens)
        pos = tp.positions[take] - i
        ranks = np.repeat(np.arange(idx.size, dtype=np.int64), lens)
        k = ranks * _POS_KEY_SHIFT + pos
        if i == 0:
            keys = k
        else:
            keys = keys[np.isin(keys, k, assume_unique=True)]
            if keys.size == 0:
                return np.zeros(n_cand, dtype=np.int64)
    counts = np.zeros(n_cand, dtype=np.int64)
    ranks = (keys // _POS_KEY_SHIFT).astype(np.int64)
    np.add.at(counts, ranks, 1)
    return counts


def _match_kernel(payload: dict):
    """Build the per-partition cogrouped applyInPandas kernel."""

    def fn(key, postings_pdf: pd.DataFrame, norms_pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        out_qid, out_doc, out_freq, out_norm, out_score = [], [], [], [], []
        if len(postings_pdf) == 0 or len(norms_pdf) == 0:
            return pd.DataFrame({"qid": [], "doc_id": [], "freq": [],
                                 "norm": [], "score": []}).astype(
                {"qid": np.int64, "doc_id": np.int64, "freq": np.int64,
                 "norm": np.int32, "score": np.float64})
        P = payload["num_partitions"]
        k = payload["k"]
        precision = payload["precision"]
        cache = payload["cache"]
        norms = np.frombuffer(norms_pdf.iloc[0]["norms"], dtype=np.uint8)

        # hot terms are striped across multiple rows (skew bound,
        # IndexConfig.max_postings_per_stripe) — reassemble in stripe order
        by_term: dict[str, list] = {}
        for row in postings_pdf.itertuples(index=False):
            by_term.setdefault(row.term, []).append(row)
        decoded: dict[str, object] = {}

        def _concat(parts):
            if len(parts) == 1:
                return parts[0]
            freqs = np.concatenate([p.freqs for p in parts])
            pos_offsets = np.zeros(freqs.size + 1, dtype=np.int64)
            np.cumsum(freqs, out=pos_offsets[1:])
            return TermPostings(
                rel_docs=np.concatenate([p.rel_docs for p in parts]),
                freqs=freqs,
                positions=np.concatenate([p.positions for p in parts]),
                pos_offsets=pos_offsets)

        def get_decoded(term, need_positions, seg_mask=None):
            """seg_mask prunes decode to the segments where every query
            term is present — the skip-data seek of matcher.c:31-35 /
            dpu.c:204-207 (segment sizes from PimIndexWriter.java:903-916).
            Full decodes are cached; masked decodes are query-specific."""
            if seg_mask is not None:
                rows = sorted(by_term[term], key=lambda r: r.stripe)
                parts = []
                for r in rows:
                    blobs = slice_segments(
                        r.doc_blob, r.freq_blob, r.pos_blob,
                        np.asarray(r.seg_doc_counts),
                        np.asarray(r.seg_doc_bytes),
                        np.asarray(r.seg_freq_bytes),
                        np.asarray(r.seg_pos_bytes), seg_mask)
                    parts.append(decode_columnar(
                        *blobs, decode_positions=need_positions))
                return _concat(parts)
            tp = decoded.get(term)
            if tp is None or (need_positions and tp.positions.size == 0
                              and tp.pos_offsets[-1] > 0):
                rows = sorted(by_term[term], key=lambda r: r.stripe)
                tp = _concat([decode_columnar(
                    r.doc_blob, r.freq_blob, r.pos_blob,
                    np.asarray(r.seg_doc_counts),
                    decode_positions=need_positions) for r in rows])
                decoded[term] = tp
            return tp

        for qid, terms, weight in payload["queries"]:
            if any(t not in by_term for t in terms):
                continue  # this partition lacks a term → no hits here
            uniq = list(dict.fromkeys(terms))
            multi = len(terms) > 1
            seg_mask = None
            if multi:
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
                if not pres.all():
                    seg_mask = pres
            tps = [get_decoded(t, multi, seg_mask) for t in uniq]

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
            if cand.size == 0:
                continue

            tfs = np.stack([tp.freqs[ix] for tp, ix in zip(tps, idxs)])
            norm_bytes = norms[cand]

            if not multi:
                freqs = tfs[0]
                scores = bm25.score(freqs, norm_bytes, weight, cache, precision)
            else:
                # WAND-style cut: evaluate candidates in descending
                # admissible upper bound order (phrase freq <= min term tf,
                # score monotone in freq — score_lower_bound.c:88-122)
                ub_freq = tfs.min(axis=0)
                ub = bm25.score(ub_freq, norm_bytes, weight, cache, precision)
                order = np.argsort(-ub.astype(np.float64), kind="stable")
                term_order = [uniq.index(t) for t in terms]
                freqs = np.zeros(cand.size, dtype=np.int64)
                scores = np.full(cand.size, -np.inf)
                chunk = max(4 * k, 256)
                n_scored = 0
                kth_best = -np.inf
                for start in range(0, order.size, chunk):
                    sel = order[start:start + chunk]
                    # strict <: an unevaluated candidate with exact == kth
                    # could still win the doc_id-asc tie-break
                    if n_scored >= k and float(ub[sel[0]]) < kth_best:
                        break  # no remaining candidate can beat the k-th
                    sub_counts = _phrase_match_counts(
                        [tps[j] for j in term_order],
                        [idxs[j][sel] for j in term_order],
                        sel.size)
                    freqs[sel] = sub_counts
                    hit = sub_counts > 0
                    if hit.any():
                        sc = bm25.score(sub_counts[hit], norm_bytes[sel][hit],
                                        weight, cache, precision)
                        scores[sel[hit]] = sc.astype(np.float64)
                        n_scored += int(hit.sum())
                        pos_scores = scores[scores > -np.inf]
                        if pos_scores.size >= k:
                            kth_best = float(np.partition(pos_scores, -k)[-k])

            hit = freqs > 0
            if not hit.any():
                continue
            h_doc = cand[hit] * P + pid
            h_freq = freqs[hit]
            h_norm = norm_bytes[hit]
            h_score = np.asarray(scores)[hit].astype(np.float64)
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

        if not out_qid:
            return pd.DataFrame({"qid": [], "doc_id": [], "freq": [],
                                 "norm": [], "score": []}).astype(
                {"qid": np.int64, "doc_id": np.int64, "freq": np.int64,
                 "norm": np.int32, "score": np.float64})
        return pd.DataFrame({
            "qid": np.concatenate(out_qid),
            "doc_id": np.concatenate(out_doc),
            "freq": np.concatenate(out_freq),
            "norm": np.concatenate(out_norm).astype(np.int32),
            "score": np.concatenate(out_score),
        })

    return fn


# term → doc_freq cache per index generation (0 = negative entry).  The
# reference caches scoring stats per query batch (PimPhraseScoreStats);
# we additionally reuse them across batches — repeated hot terms skip the
# stats-lookup job entirely.  Keyed by manifest identity so a rebuilt
# index in the same dir invalidates.
_TERM_STATS_CACHE: dict[tuple, dict[str, int]] = {}


def _stats_cache_key(m: IndexManifest) -> tuple:
    return (m.index_dir, m.doc_count, m.sum_total_term_freq,
            m.norm_quant_factor)


def plan_queries(spark: SparkSession, manifest: IndexManifest,
                 queries: list[tuple[int, str]], k: int,
                 precision: str) -> tuple[list, list[str]]:
    """Driver-side scoring-stats build (Q2) + no-match short-circuit (Q3)."""
    term_lists = {qid: tokenize_one(text, manifest.tokenizer)
                  for qid, text in queries}
    all_terms = sorted({t for ts in term_lists.values() for t in ts})
    if not all_terms:
        return [], []
    cache = _TERM_STATS_CACHE.setdefault(_stats_cache_key(manifest), {})
    missing = [t for t in all_terms if t not in cache]
    if missing:
        stats = (spark.read.parquet(manifest.stats_path)
                 .filter(F.col("term").isin(missing))
                 .collect())
        found = {r["term"]: int(r["doc_freq"]) for r in stats}
        for t in missing:
            cache[t] = found.get(t, 0)
    doc_freq = {t: cache[t] for t in all_terms if cache[t] > 0}
    planned = []
    for qid, terms in term_lists.items():
        if not terms or any(t not in doc_freq for t in terms):
            continue  # Q3: constant-zero weight
        dfs = np.array([doc_freq[t] for t in terms], dtype=np.int64)
        weight = bm25.phrase_weight(dfs, manifest.doc_count,
                                    boost=1.0, precision=precision)
        planned.append((qid, tuple(terms), float(weight)))
    needed_terms = sorted({t for _, ts, _ in planned for t in ts})
    return planned, needed_terms


def search(spark: SparkSession, index: IndexManifest | str,
           queries: list[tuple[int, str]], k: int = 10,
           precision: str = "float32",
           final_merge: str = "window") -> DataFrame:
    """Batched top-k phrase/term search → DataFrame(qid, doc_id, freq, norm, score).

    ``precision='float32'`` reproduces Lucene's float expression tree
    (scores returned as their exact float64 upcast); ``'float64'`` runs the
    same tree in doubles (ANSI-SQL reproducible).

    ``final_merge``: ``'window'`` (default) keeps the global top-k as a
    rank window in the plan; ``'driver'`` collects the per-partition
    top-k rows (≤ P·k per query — tiny) and heap-merges on the driver,
    the reference's host-side merge (``topdocs_sync.c:369-412``) — one
    exchange less, lower latency for small k.
    """
    manifest = IndexManifest.load(index) if isinstance(index, str) else index
    planned, needed_terms = plan_queries(spark, manifest, queries, k, precision)
    empty = spark.createDataFrame([], RESULT_SCHEMA)
    if not planned:
        return empty

    avgdl = bm25.avg_field_length(manifest.sum_total_term_freq,
                                  manifest.doc_count, precision)
    payload = {
        "queries": planned,
        "k": int(k),
        "precision": precision,
        "cache": bm25.score_cache(avgdl, manifest.k1, manifest.b, precision),
        "num_partitions": manifest.num_partitions,
    }

    postings = (spark.read.parquet(*[manifest.chunk_path(c) for c in
                                     range(manifest.build_chunks)])
                .filter(F.col("term").isin(list(needed_terms))))
    norms = spark.read.parquet(manifest.norms_path)

    per_part = (postings.groupBy("pid")
                .cogroup(norms.groupBy("pid"))
                .applyInPandas(_match_kernel(payload), RESULT_SCHEMA))

    if final_merge == "driver":
        pdf = per_part.toPandas()
        if len(pdf):
            pdf = (pdf.sort_values(["qid", "score", "doc_id"],
                                   ascending=[True, False, True])
                   .groupby("qid", sort=True).head(k))
        return spark.createDataFrame(pdf, RESULT_SCHEMA)

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (per_part
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .drop("rank"))


def search_term(spark: SparkSession, index: IndexManifest | str, term: str,
                k: int = 10**9, precision: str = "float32") -> DataFrame:
    """Single-term query (Q22) — free by-product of the phrase path."""
    return search(spark, index, [(0, term)], k=k, precision=precision)
