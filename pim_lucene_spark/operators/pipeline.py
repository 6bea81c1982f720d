"""End-to-end corpus curation — the one-call training-data pipeline.

Composes the verified building blocks (``textstats.text_quality``,
``textstats.lang_id``, ``dedup.exact_dedup``-style hash grouping,
``dedup.drop_duplicates_clustered``) into the operation a 100 TB
pretraining pipeline actually runs: filter on quality features and
language, then drop exact and transitive near-duplicates, keeping one
canonical doc per duplicate group.

Plan shape at scale: the feature computation and every gate are pure
map-stage Catalyst expressions (no UDF, no shuffle — they run inside
the Parquet scan's whole-stage codegen); exact dedup is ONE hash
shuffle on sha256(text) over the gate survivors — the full row (doc
payload included) moves through that exchange once.  A projected
min-id + semi-join-back shape was considered and rejected: the join
back by id re-shuffles the payload anyway (same one payload exchange,
plus an extra small shuffle), and an exact no-shuffle filter would
need the survivor set broadcast, which does not fit at corpus scale.
Near-dup resolution adds the LSH-bounded pair generation plus
O(log diameter) label-propagation rounds (see
``dedup.connected_components``) — those operate on (id, hash)
projections only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pim_lucene_spark.operators import textstats
from pim_lucene_spark.operators.dedup import drop_duplicates_clustered


def curate_corpus(docs: DataFrame, *,
                  min_quality: float | None = None,
                  langs: tuple | None = None,
                  min_tokens: int | None = None,
                  max_tokens: int | None = None,
                  exact_dedup: bool = True,
                  near_dup_pairs: DataFrame | None = None,
                  id_col: str = "doc_id",
                  text_col: str = "content") -> DataFrame:
    """Filter + dedup a document corpus → the surviving docs, annotated
    with ``quality_score`` and ``lang_pred``.

    Steps, in order (filters first so dedup only shuffles survivors):

    1. quality gate: ``quality_score >= min_quality`` (the
       :func:`~pim_lucene_spark.operators.textstats.text_quality`
       score, rounded to 6 decimals — deterministic) and optional
       token-count bounds.
    2. language gate: ``lang_pred ∈ langs`` (n-gram-marker heuristic).
    3. exact dedup: survivors sharing ``sha256(text)`` keep the
       smallest doc id.
    4. near-dup dedup (optional): ``near_dup_pairs`` — a
       (doc_a, doc_b) frame from any of the dedup operators
       (:func:`minhash_lsh_pairs`, :func:`simhash_pairs`, …) — resolves
       into transitive clusters; each cluster keeps its
       HIGHEST-QUALITY member (ties: smallest id).  Pairs whose docs
       were already dropped by the gates or exact dedup are ignored.

    Returns the original ``docs`` columns plus ``quality_score`` and
    ``lang_pred``.
    """
    if id_col != "doc_id" and "doc_id" in docs.columns:
        raise ValueError(
            "docs already has a 'doc_id' column while id_col="
            f"{id_col!r}; rename one (the output id column is named "
            "'doc_id')")
    taken = {"quality_score", "lang_pred", "n_tokens"} & set(docs.columns)
    if taken:
        raise ValueError(
            f"docs columns {sorted(taken)} collide with curate_corpus "
            "output columns; rename them first")
    # features INLINE on the scan (quality_cols / lang_pred_col are the
    # same Catalyst expressions text_quality / lang_id emit) — never a
    # feature-frame join back by id, which would shuffle the payload
    c = textstats.quality_cols(text_col)
    base = (docs.withColumn("doc_id", F.col(id_col).cast("long"))
            .withColumn("quality_score", c["quality"])
            .withColumn("n_tokens", c["n_tokens"].cast("long"))
            .withColumn("lang_pred",
                        textstats.lang_pred_col(text_col)))
    if min_quality is not None:
        base = base.filter(F.col("quality_score") >= float(min_quality))
    if min_tokens is not None:
        base = base.filter(F.col("n_tokens") >= int(min_tokens))
    if max_tokens is not None:
        base = base.filter(F.col("n_tokens") <= int(max_tokens))
    if langs is not None:
        base = base.filter(F.col("lang_pred").isin(list(langs)))
    if exact_dedup:
        w = F.min("doc_id").over(
            Window.partitionBy(F.sha2(F.col(text_col), 256)))
        base = (base.withColumn("_keep", w)
                .filter(F.col("doc_id") == F.col("_keep")).drop("_keep"))
    if near_dup_pairs is not None:
        base = drop_duplicates_clustered(base, near_dup_pairs,
                                         id_col="doc_id",
                                         prefer_col="quality_score")
    out_cols = [c for c in docs.columns if c != id_col]
    return base.select("doc_id", *out_cols, "quality_score", "lang_pred")
