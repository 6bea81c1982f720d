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
                  precision: str = "float64", ann: str = "auto",
                  lsh_threshold: int = 100_000, num_planes: int = 12,
                  num_tables: int = 4, seed: int = 42,
                  dim: int | None = None,
                  emb_rows: int | None = None) -> DataFrame:
    """Hybrid full-text + dense retrieval over a shared id space
    (``doc_id == vec_id``): BM25 top-``n_candidates`` fused with cosine
    top-``n_candidates`` by RRF.

    Each query is ``(qid, text, query_vec_id)`` — an id into ``emb``
    (raw query vectors: append them to ``emb`` first).  The dense side
    is selected by ``ann``:

    - ``"bruteforce"`` — exact cosine, one full corpus pass per batch
      (:func:`~pim_lucene_spark.operators.similarity
      .cosine_topk_bruteforce`); the verify-quality path.
    - ``"lsh"`` — multi-table sign-LSH bucketed candidates + exact
      rerank (:func:`~pim_lucene_spark.operators.similarity
      .lsh_bucketed_topk`); the scale path — the dense join touches only
      same-bucket rows, never the corpus × queries product.
    - ``"ivf"`` — k-means inverted lists + nprobe probing
      (:func:`~pim_lucene_spark.operators.similarity.ivf_topk`); the
      alternative scale path where the corpus has cluster structure.
    - ``"auto"`` (default) — LSH when ``emb`` has more than
      ``lsh_threshold`` rows, else brute force.  Pass ``emb_rows`` (a
      known row count, e.g. from a table catalog or manifest) to decide
      without any job; otherwise one count-star runs, answered from
      Parquet metadata.  At 100 TB the corpus is always past the
      threshold, so auto is the scale plan by default.

    Every query pseudo-doc vector (the whole ``query_vec_id`` set, not
    just each query's own id) is excluded from the dense candidates, so
    one query's vector can never rank in another query's fused results.
    """
    from pim_lucene_spark.operators.search import search
    from pim_lucene_spark.operators.similarity import (
        cosine_topk_bruteforce,
        lsh_bucketed_topk,
    )

    if ann not in ("auto", "bruteforce", "lsh", "ivf"):
        raise ValueError("ann must be 'auto', 'bruteforce', 'lsh' "
                         "or 'ivf'")
    ft = (search(spark, index, [(qid, text) for qid, text, _ in queries],
                 k=n_candidates, precision=precision)
          .select("qid", "doc_id", "score"))
    qvec_ids = {int(v) for _, _, v in queries}
    if ann == "auto":
        # pass emb_rows (e.g. from a catalog/manifest row count) to avoid
        # even the metadata-only count-star job on the auto route
        n_rows = emb_rows if emb_rows is not None else emb.count()
        ann = "lsh" if n_rows > lsh_threshold else "bruteforce"
    if ann == "lsh":
        ann_raw = lsh_bucketed_topk(emb, sorted(qvec_ids),
                                    k=n_candidates + len(qvec_ids),
                                    num_planes=num_planes,
                                    num_tables=num_tables, seed=seed,
                                    dim=dim)
    elif ann == "ivf":
        from pim_lucene_spark.operators.similarity import ivf_topk
        ann_raw = ivf_topk(emb, sorted(qvec_ids),
                           k=n_candidates + len(qvec_ids), seed=seed)
    else:
        ann_raw = cosine_topk_bruteforce(emb, sorted(qvec_ids),
                                         k=n_candidates + len(qvec_ids))
    # anti-join the full query-vector id set (pseudo-docs are not
    # documents); k was over-fetched by |qvec_ids| above so the bound
    # still yields n_candidates real docs
    ann_raw = ann_raw.filter(~F.col("vec_id").isin(sorted(qvec_ids)))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"),
                                          F.asc("vec_id"))
    ann_raw = (ann_raw.withColumn("_r", F.row_number().over(w))
               .filter(F.col("_r") <= n_candidates).drop("_r"))
    # map vector-query ids back onto the caller's qids
    remap = spark.createDataFrame(
        [(int(v), int(qid)) for qid, _, v in queries],
        "vqid long, qid long")
    ann = (ann_raw.withColumnRenamed("qid", "vqid")
           .join(F.broadcast(remap), "vqid")
           .select("qid", F.col("vec_id").alias("doc_id"),
                   F.col("cosine").alias("score")))
    return rrf_fuse([ft, ann], k=k, k_rrf=k_rrf)
