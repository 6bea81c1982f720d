"""Term suggestion + hit counting — the small IndexSearcher utilities.

- :func:`suggest_terms` — prefix autocomplete over the term dictionary,
  ranked by document frequency (Lucene's ``TermFreqIterator``-backed
  suggesters rank completions by weight = docFreq/totalTermFreq).  The
  dictionary IS the index's term-stats Parquet, so the whole operator is
  a pushed-down ``StringStartsWith`` scan + top-k — no postings touched,
  no Python in the plan.
- :func:`count_matches` — hit count per query with no scoring
  (``IndexSearcher.count``): term/phrase queries count matching docs via
  the engine's no-score match path; multi-term queries count the
  distinct-doc union of their expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pim_lucene_spark.manifest import IndexManifest


def suggest_terms(spark: SparkSession, index: IndexManifest | str,
                  prefix: str, k: int = 10,
                  by: str = "doc_freq") -> DataFrame:
    """Top-``k`` completions of ``prefix`` → (term, doc_freq, total_tf).

    Ranked ``by`` "doc_freq" or "total_tf" (desc), ties term asc.  The
    prefix filter reaches the Parquet scan as ``StringStartsWith``.
    """
    if by not in ("doc_freq", "total_tf"):
        raise ValueError("by must be 'doc_freq' or 'total_tf'")
    manifest = IndexManifest.load(index) if isinstance(index, str) else index
    stats = spark.read.parquet(manifest.stats_path)
    out = stats.filter(F.col("term").startswith(prefix))
    win = Window.orderBy(F.desc(by), F.asc("term"))
    return (out.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k).drop("rank")
            .select("term", "doc_freq", "total_tf"))


def suggest_terms_local(index: IndexManifest | str, prefix: str,
                        k: int = 10, by: str = "doc_freq"):
    """Serving-path suggester: the same completion list with NO Spark
    job — one pyarrow read of the stats dictionary with the prefix
    filter pushed down (row-group pruning on the sorted term column).
    Returns a pandas frame (term, doc_freq, total_tf); row-identical to
    :func:`suggest_terms` (differential-tested).  Autocomplete-as-you-
    type latency next to ``search_local``.
    """
    import pyarrow.parquet as pq

    if by not in ("doc_freq", "total_tf"):
        raise ValueError("by must be 'doc_freq' or 'total_tf'")
    manifest = IndexManifest.load(index) if isinstance(index, str) else index
    # closed prefix interval [prefix, prefix + MAX_CHAR): range predicates
    # prune row groups via the column's min/max stats
    hi = prefix + "\U0010FFFF"
    pdf = pq.read_table(
        manifest.stats_path,
        columns=["term", "doc_freq", "total_tf"],
        filters=[("term", ">=", prefix), ("term", "<", hi)]).to_pandas()
    pdf = pdf[pdf.term.str.startswith(prefix)]
    pdf = pdf.sort_values([by, "term"], ascending=[False, True],
                          kind="stable")
    return pdf.head(k).reset_index(drop=True)


def count_matches(spark: SparkSession, index: IndexManifest | str,
                  queries: list[tuple[int, object]]) -> DataFrame:
    """Hit counts → (qid, n_hits) — ``IndexSearcher.count`` semantics.

    Entries are query texts (multi-token = phrase), typed
    ``PhraseQuery``/``TermQuery``, or multi-term queries.  Counting goes
    through the match paths with no norms or score work kept: term/
    phrase counts come from the engine search result frame, multi-term
    counts from the distinct-doc constant-score frame.  Queries with
    zero hits still appear (count 0).
    """
    from pim_lucene_spark.operators.search import search
    from pim_lucene_spark.plans.boolean import BooleanQuery
    from pim_lucene_spark.plans.dismax import DisMaxQuery
    from pim_lucene_spark.plans.multiterm import (MultiTermQueryT,
                                                  search_multiterm)
    from pim_lucene_spark.plans.query import to_tuple
    from pim_lucene_spark.plans.router import search_with_fallback

    manifest = IndexManifest.load(index) if isinstance(index, str) else index
    plain, multi, sloppy, slops, compound = [], [], [], {}, []
    for qid, q in queries:
        if isinstance(q, (BooleanQuery, DisMaxQuery)):
            compound.append((qid, q))
        elif isinstance(q, MultiTermQueryT):
            multi.append((qid, q))
        elif int(getattr(q, "slop", 0)) != 0:
            # sloppy phrases count via the scan path — the exact-match
            # path would silently undercount them
            sloppy.append((qid, q.text, float(getattr(q, "boost", 1.0))))
            slops[int(qid)] = int(q.slop)
        else:
            plain.append((qid, q))
    parts = []
    if plain:
        res = search(spark, manifest,
                     [to_tuple(qid, q) for qid, q in plain], k=10 ** 9)
        parts.append(res.groupBy("qid")
                     .agg(F.count("*").alias("n_hits")))
    if multi:
        res = search_multiterm(spark, manifest, multi, k=None,
                               rewrite="constant_score")
        parts.append(res.groupBy("qid")
                     .agg(F.count("*").alias("n_hits")))
    if sloppy:
        res = search_with_fallback(spark, manifest, None, sloppy,
                                   k=10 ** 9, slop=slops)
        parts.append(res.groupBy("qid")
                     .agg(F.count("*").alias("n_hits")))
    if compound:
        # boolean/dismax count via the count-only compound kernel when
        # the index + clauses qualify (same guards as search_boolean /
        # search_dismax); the rest fall back to the join plan + groupBy
        # count so cogroup-norms / v<3 indexes and sloppy/constant-score
        # clauses still count instead of raising in executors
        from pim_lucene_spark.plans.compound import (clause_kernelable,
                                                     count_compound,
                                                     kernel_hostable)
        kq, jq = [], []
        hostable = kernel_hostable({"": manifest})
        for qid, q in compound:
            mf = {"": manifest}
            ok = hostable and (
                all(clause_kernelable(c, manifests=mf)
                    for c in q.clauses)
                if isinstance(q, DisMaxQuery)
                else clause_kernelable(q, manifests=mf))
            (kq if ok else jq).append((qid, q))
        if kq:
            counts = count_compound(spark, {"": manifest}, "", kq)
            parts.append(spark.createDataFrame(
                [(int(q), int(n)) for q, n in counts.items()],
                "qid long, n_hits long"))
        if jq:
            from pim_lucene_spark.plans.boolean import search_boolean
            from pim_lucene_spark.plans.dismax import search_dismax
            jb = [(qid, q) for qid, q in jq if isinstance(q, BooleanQuery)]
            jd = [(qid, q) for qid, q in jq if isinstance(q, DisMaxQuery)]
            for batch, fn in ((jb, search_boolean), (jd, search_dismax)):
                if batch:
                    res = fn(spark, manifest, batch, k=10 ** 9, plan="join")
                    parts.append(res.groupBy("qid")
                                 .agg(F.count("*").alias("n_hits")))
    all_qids = spark.createDataFrame([(int(q),) for q, _ in queries],
                                     "qid long")
    out = parts[0] if parts else None
    for p in parts[1:]:
        out = out.unionByName(p)
    if out is None:
        return all_qids.select("qid", F.lit(0).cast("long").alias("n_hits"))
    return (all_qids.join(out, "qid", "left")
            .select("qid", F.coalesce("n_hits", F.lit(0))
                    .cast("long").alias("n_hits")))
