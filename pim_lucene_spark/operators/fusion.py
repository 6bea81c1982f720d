"""Hybrid retrieval — reciprocal-rank fusion of ranked result lists.

The modern retrieval stack pairs the full-text BM25 engine with dense
(embedding) ANN and fuses the rankings; RRF (Cormack, Clarke & Buettcher,
SIGIR'09) is the standard scoreless fusion:

    rrf(d) = Σ_lists 1 / (k_rrf + rank_list(d))

Ranks come from each list's own (score desc, id asc) order, so BM25 and
cosine scales never need calibration.  The plan is bounded end-to-end:
each input is already a per-query top-n frame (≤ |queries|·n rows), the
rank windows run over those tiny frames, and the fusion is a chain of
per-query full joins over ≤ n-row sides — no corpus-sized shuffle
anywhere.  Contribution order is fixed (input-list order, coalesce-0
chain), so the float sum is deterministic and ANSI-SQL reproducible
(the DuckDB oracle hash-matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(frames: list[DataFrame], k: int = 10, k_rrf: int = 60,
             id_col: str = "doc_id",
             score_col: str = "score") -> DataFrame:
    """Fuse per-query rankings → (qid, doc_id, score) top-k.

    ``frames``: DataFrames with (qid, ``id_col``, ``score_col``) — each
    a per-query candidate ranking (typically a top-n result).  A doc
    absent from a list contributes 0 for it (standard RRF).
    """
    if not frames:
        raise ValueError("need at least one ranking to fuse")
    w = Window.partitionBy("qid").orderBy(F.desc(score_col),
                                          F.asc(id_col))
    ranked = []
    for i, f in enumerate(frames):
        ranked.append(
            f.select("qid", F.col(id_col).alias("doc_id"),
                     F.row_number().over(w).alias(f"r{i}")))
    base = ranked[0]
    for r in ranked[1:]:
        base = base.join(r, ["qid", "doc_id"], "full")
    total = None
    for i in range(len(frames)):
        c = F.when(F.col(f"r{i}").isNotNull(),
                   F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(f"r{i}"))
                   ).otherwise(F.lit(0.0))
        total = c if total is None else total + c
    win = Window.partitionBy("qid").orderBy(F.desc("score"),
                                            F.asc("doc_id"))
    return (base.select("qid", "doc_id", total.alias("score"))
            .withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k).drop("rank"))


def hybrid_search(spark, index, emb: DataFrame,
                  queries: list[tuple[int, str, int]],
                  k: int = 10, n_candidates: int = 50, k_rrf: int = 60,
                  precision: str = "float64") -> DataFrame:
    """Hybrid full-text + dense retrieval over a shared id space
    (``doc_id == vec_id``): BM25 top-``n_candidates`` fused with cosine
    top-``n_candidates`` by RRF.

    Each query is ``(qid, text, query_vec_id)`` — an id into ``emb``
    (raw query vectors: append them to ``emb`` first) — the dense side
    reuses
    :func:`~pim_lucene_spark.operators.similarity.cosine_topk_bruteforce`
    with the embedding of ``query_vec_id`` as the query vector (swap in
    the LSH-bucketed variant at scale).
    """
    from pim_lucene_spark.operators.search import search
    from pim_lucene_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    ft = (search(spark, index, [(qid, text) for qid, text, _ in queries],
                 k=n_candidates, precision=precision)
          .select("qid", "doc_id", "score"))
    qvec_ids = {int(v) for _, _, v in queries}
    ann_raw = cosine_topk_bruteforce(emb, sorted(qvec_ids),
                                     k=n_candidates)
    # map vector-query ids back onto the caller's qids
    remap = spark.createDataFrame(
        [(int(v), int(qid)) for qid, _, v in queries],
        "vqid long, qid long")
    ann = (ann_raw.withColumnRenamed("qid", "vqid")
           .join(F.broadcast(remap), "vqid")
           .select("qid", F.col("vec_id").alias("doc_id"),
                   F.col("cosine").alias("score")))
    return rrf_fuse([ft, ann], k=k, k_rrf=k_rrf)
