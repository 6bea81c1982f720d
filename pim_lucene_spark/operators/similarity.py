"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_bruteforce``: exact top-k cosine neighbors — broadcast the
  (small) query set, JVM-side dot products via zip_with/aggregate, window
  top-k.  The baseline; scales as one pass over the corpus per batch.
- ``lsh_bucketed_topk``: random-hyperplane LSH (sign bits of seeded
  projections) — the scale path: each vector lands in one bucket, the
  join touches only same-bucket candidates.  Recall-approximate; exact
  rerank within buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk_bruteforce(emb: DataFrame, query_ids: list[int], k: int = 10,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: (qid, vec_id, cosine) for each query id.

    VERIFY-ONLY PATH: this is an O(corpus × queries) crossJoin kept as
    the exactness oracle for the LSH/IVF approximate paths and for small
    corpora.  Never route production traffic here — ``ann="auto"``
    (:func:`~pim_lucene_spark.operators.fusion.hybrid_topk`) switches to
    LSH above ``lsh_threshold`` rows, and at 100 TB the corpus is always
    past it.

    All arithmetic in float64 (embeddings upcast) with deterministic
    left-to-right fold order, so the result is ANSI-SQL reproducible.
    """
    base = emb.select(F.col(id_col).cast("long").alias("vec_id"),
                      F.transform(F.col(vec_col),
                                  lambda x: x.cast("double")).alias("v"))
    queries = (base.filter(F.col("vec_id").isin([int(q) for q in query_ids]))
               .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
    joined = base.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("qid"))
    cos = _dot("qv", "v") / (_norm("qv") * _norm("v"))
    scored = joined.select("qid", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k).drop("rank"))


def _hyperplanes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).astype(np.float64)


def lsh_bucket_udf(dim: int, num_planes: int = 16, seed: int = 42):
    planes = _hyperplanes(dim, num_planes, seed)

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (n, dim)
        signs = (m.astype(np.float64) @ planes.T) > 0  # (n, planes)
        vals = (signs.astype(np.uint64)
                << np.arange(num_planes, dtype=np.uint64)).sum(axis=1)
        return pd.Series(vals.view(np.int64))

    return bucket


def table_seed(seed: int, table: int) -> int:
    """Per-table hyperplane seed (table 0 == the single-table seed)."""
    return seed + 7919 * table


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.3,
                            num_planes: int = 8, num_tables: int = 4,
                            seed: int = 42, dim: int | None = None,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup-by-embedding mode):
    (vec_a, vec_b, cosine) with vec_a < vec_b and cosine >= threshold.

    Scale path: multi-table sign-LSH bucketing — candidates are pairs that
    collide in ANY table's bucket (equi-join on (table, bucket), never the
    O(n²) pair space), then exact cosine verify, so ``threshold`` is exact
    and LSH only affects recall (tunable via num_tables × num_planes).
    Deterministic: seeded hyperplanes, reproducible in SQL with the planes
    inlined as literals.
    """
    if dim is None:
        dim = len(emb.select(F.col(vec_col)).first()[0])
    base = emb.select(F.col(id_col).cast("long").alias("vec_id"),
                      F.transform(F.col(vec_col),
                                  lambda x: x.cast("double")).alias("v"))
    buckets = [lsh_bucket_udf(dim, num_planes, table_seed(seed, t))
               for t in range(num_tables)]
    tabbed = base.select(
        "vec_id", "v",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("tab"),
                     buckets[t](F.col("v")).alias("bucket"))
            for t in range(num_tables)])).alias("tb")
    ).select("vec_id", "v", "tb.tab", "tb.bucket")
    cand = (tabbed.alias("x").join(
                tabbed.alias("y"),
                (F.col("x.tab") == F.col("y.tab"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.vec_id") < F.col("y.vec_id")))
            .select(F.col("x.vec_id").alias("vec_a"),
                    F.col("y.vec_id").alias("vec_b"),
                    F.col("x.v").alias("va"), F.col("y.v").alias("vb"))
            .dropDuplicates(["vec_a", "vec_b"]))
    cos = _dot("va", "vb") / (_norm("va") * _norm("vb"))
    return (cand.select("vec_a", "vec_b", cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def kmeans_centroids(emb: DataFrame, num_centroids: int = 64,
                     iters: int = 10, seed: int = 42,
                     sample: int = 20_000,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> np.ndarray:
    """Deterministic k-means centroids for the IVF index — trained on a
    bounded SAMPLE collected to the driver (the standard IVF recipe:
    training wants thousands of points per centroid, never the corpus;
    at 100 TB the sample is a tiny seeded `.limit` pushdown while
    assignment stays fully distributed).  Lloyd iterations in numpy with
    a fixed seed → reproducible centroids (the oracle inlines them as
    SQL literals).  Empty clusters re-seed to the farthest points."""
    rows = (emb.select(F.col(id_col).cast("long").alias("i"),
                       F.col(vec_col).alias("v"))
            .orderBy("i").limit(int(sample)).collect())
    m = np.asarray([list(map(float, r["v"])) for r in rows],
                   dtype=np.float64)
    return kmeans_centroids_np(m, num_centroids, iters, seed)


def kmeans_centroids_np(m: np.ndarray, num_centroids: int = 64,
                        iters: int = 10, seed: int = 42) -> np.ndarray:
    """Pure-numpy Lloyd core (deterministic): shared by the Spark
    trainer and the DuckDB oracle builder, so both sides inline the
    IDENTICAL centroids."""
    rng = np.random.default_rng(seed)
    c = int(min(num_centroids, len(m)))
    cents = m[rng.choice(len(m), size=c, replace=False)]
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        # cosine assignment: normalize then argmax dot
        cn = cents / np.maximum(np.linalg.norm(cents, axis=1,
                                               keepdims=True), 1e-12)
        sims = mn @ cn.T
        assign = sims.argmax(axis=1)
        empty = []
        for j in range(c):
            sel = m[assign == j]
            if len(sel):
                cents[j] = sel.mean(axis=0)
            else:
                empty.append(j)
        if empty:
            # re-seed each empty cluster to a DISTINCT worst-served
            # point (ascending best-similarity order); a shared point
            # would collapse them back together every iteration
            order = np.argsort(sims.max(axis=1), kind="stable")
            for t, j in enumerate(empty):
                cents[j] = m[order[t % len(order)]]
    return cents


def ivf_assign_udf(centroids: np.ndarray):
    """Nearest-centroid (cosine) bucket id — the IVF list assignment,
    a pure map stage (Arrow-batched; at ingest time this column is
    precomputed and the search join is a pushdown equi-join)."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf(T.IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        # argmax of v·ĉ (row normalization is scale-invariant for the
        # ARGMAX, and skipping it keeps the floats bit-comparable with
        # the SQL oracle's raw dot products)
        return pd.Series((m @ cn.T).argmax(axis=1).astype(np.int32))

    return bucket


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
             num_centroids: int = 64, nprobe: int = 4,
             iters: int = 10, seed: int = 42, sample: int = 20_000,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: np.ndarray | None = None) -> DataFrame:
    """IVF approximate cosine top-k: coarse k-means quantizer, each
    query probes its ``nprobe`` nearest centroid lists, exact rerank
    inside the probed lists — the inverted-file ANN structure (the
    text-index analogue: centroid = term, list = postings).

    Scale shape: centroid training is bounded (driver sample), list
    assignment is one map stage (precompute at ingest), and the search
    join touches only ``nprobe/num_centroids`` of the corpus per query
    — an equi-join on the bucket column, never all pairs.  Recall is
    tunable via ``nprobe`` (= num_centroids ⟹ exact).  Deterministic
    for fixed seed: the oracle inlines the trained centroids and
    replays assignment + probe + rerank in SQL.
    """
    if centroids is None:
        centroids = kmeans_centroids(emb, num_centroids, iters, seed,
                                     sample, id_col, vec_col)
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    base = emb.select(F.col(id_col).cast("long").alias("vec_id"),
                      F.transform(F.col(vec_col),
                                  lambda x: x.cast("double")).alias("v"))
    bucket = ivf_assign_udf(centroids)
    tagged = base.withColumn("bucket", bucket(F.col("v")))
    # per-query probe set: nprobe nearest centroids of the QUERY vector
    qrows = (base.filter(F.col("vec_id")
                         .isin([int(q) for q in query_ids]))
             .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
             .collect())
    probes = []
    for r in qrows:
        qv = np.asarray(r["qv"], dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        top = np.argsort(-(cn @ qv), kind="stable")[:nprobe]
        probes += [(int(r["qid"]), int(b)) for b in top]
    pframe = F.broadcast(
        tagged.sparkSession.createDataFrame(probes,
                                            "qid long, bucket int"))
    # reuse the collected query vectors (broadcast anyway) instead of
    # re-scanning the embeddings source a second time
    qframe = F.broadcast(tagged.sparkSession.createDataFrame(
        [(int(r["qid"]), [float(x) for x in r["qv"]]) for r in qrows],
        "qid long, qv array<double>"))
    cand = (tagged.join(pframe, "bucket")
            .join(qframe, "qid")
            .filter(F.col("vec_id") != F.col("qid")))
    cos = _dot("qv", "v") / (_norm("qv") * _norm("v"))
    scored = cand.select("qid", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k).drop("rank"))


def lsh_bucketed_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
                      num_planes: int = 12, seed: int = 42,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      dim: int | None = None,
                      num_tables: int = 1) -> DataFrame:
    """Approximate cosine top-k: exact rerank within the query's LSH
    bucket(s).

    Deterministic (seeded hyperplanes).  ``num_tables`` independent
    hash tables trade storage/compute for recall the standard way: a
    neighbor is a candidate if it collides with the query in ANY table
    (miss probability decays exponentially in the table count, the fix
    for single-table sign-LSH's poor recall at scale).  At 100 TB the
    (table, bucket) columns are precomputed at ingest and the join is an
    equi-join — no all-pairs pass, candidates deduped before rerank.

    Pass ``dim`` explicitly (schema metadata or catalog); when omitted, a
    one-row lookup infers it (avoid in hot paths — extra Spark job).
    """
    if dim is None:
        dim = len(emb.select(F.col(vec_col)).first()[0])
    base = emb.select(F.col(id_col).cast("long").alias("vec_id"),
                      F.transform(F.col(vec_col),
                                  lambda x: x.cast("double")).alias("v"))
    buckets = [lsh_bucket_udf(dim, num_planes, table_seed(seed, t))
               for t in range(num_tables)]
    tabbed = base.select(
        "vec_id", "v",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("tab"), buckets[t](F.col("v"))
                     .alias("bucket"))
            for t in range(num_tables)])).alias("tb")
    ).select("vec_id", "v", "tb.tab", "tb.bucket")
    queries = (tabbed.filter(F.col("vec_id").isin([int(q) for q in query_ids]))
               .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
                       F.col("tab").alias("qtab"),
                       F.col("bucket").alias("qbucket")))
    cand = (tabbed.join(F.broadcast(queries),
                        (F.col("tab") == F.col("qtab"))
                        & (F.col("bucket") == F.col("qbucket"))
                        & (F.col("vec_id") != F.col("qid")))
            .select("qid", "qv", "vec_id", "v")
            .dropDuplicates(["qid", "vec_id"]))
    cos = _dot("qv", "v") / (_norm("qv") * _norm("v"))
    scored = cand.select("qid", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k).drop("rank"))
