"""Deduplication operators for large-scale corpus curation.

Beyond the reference's capability set (pim-lucene has no dedup), these are
the standard operators a 100 TB training-data pipeline needs, expressed
Spark-first:

- ``exact_dedup``      : hash-groupBy on sha256(content) — one shuffle.
- ``ngram_jaccard_pairs``: blocked exact token-n-gram Jaccard (SQL-checkable).
- ``minhash_lsh_pairs``  : MinHash signatures + banded LSH bucketing —
  the scale path: shuffles only O(docs × bands) bucket keys, never the
  O(n²) pair space; candidates verified with exact Jaccard.
- ``simhash_pairs``      : 64-bit SimHash + banded hamming candidates.

All hashing is deterministic (xxhash64 with fixed salts) so results are
reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fixed 64-bit mixing constants for the k MinHash permutations
_MERSENNE = (1 << 61) - 1


def _hash_params(num_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


def tokens_col(text_col: str = "content"):
    """Whitespace tokens as array<string> (split + drop empties)."""
    return F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != "")


def ngrams_col(tokens, n: int):
    """Token n-grams as space-joined strings, built from zip_with shifts."""
    # transform over index range; slice is 1-based
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "content") -> DataFrame:
    """Exact duplicate groups: (content_hash, keep_id, dup_count).

    keep_id = lowest doc_id of the group (the canonical survivor).
    One hash-shuffle; at scale combine with AQE skew handling for
    pathological boilerplate values.
    """
    return (docs
            .select(F.sha2(F.col(text_col), 256).alias("content_hash"),
                    F.col(id_col).cast("long").alias("doc_id"))
            .groupBy("content_hash")
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count("*").alias("dup_count")))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "content",
                        block_col: str | None = None) -> DataFrame:
    """Exact token-n-gram Jaccard over blocked candidate pairs.

    ``block_col`` bounds the pair space (equi-join blocking); with None the
    join is a full self-join — only for small corpora / tests.  Returns
    (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    """
    g = (docs.select(F.col(id_col).cast("long").alias("doc_id"),
                     *( [F.col(block_col).alias("blk")] if block_col else
                        [F.lit(0).alias("blk")] ),
                     F.array_distinct(ngrams_col(tokens_col(text_col), n))
                      .alias("grams")))
    a = g.alias("a")
    b = g.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    jac = inter.cast("double") / union.cast("double")
    return (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def minhash_signatures(docs: DataFrame, num_hashes: int = 64, n: int = 3,
                       id_col: str = "doc_id", text_col: str = "content",
                       seed: int = 42) -> DataFrame:
    """(doc_id, sig array<long>) MinHash signatures over token n-grams.

    The k "permutations" are xxhash64 with k distinct salts (JVM-side,
    wrap-safe under ANSI mode); the whole signature build is one explode +
    one groupBy (map-side combinable min aggregates).
    """
    sh = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                     F.explode(F.array_distinct(
                         ngrams_col(tokens_col(text_col), n))).alias("gram"))
    mins = [F.min(F.xxhash64(F.lit(seed + k), F.col("gram"))).alias(f"m{k}")
            for k in range(num_hashes)]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select("doc_id", F.array(*[f"m{k}" for k in range(num_hashes)])
                      .alias("sig"))


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = 64, bands: int = 16,
                      n: int = 3, threshold: float = 0.5,
                      id_col: str = "doc_id", text_col: str = "content",
                      seed: int = 42) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH + exact Jaccard verify.

    Scale path: docs sharing any band bucket become candidates (shuffle on
    (band, bucket-hash)); candidates are re-verified with exact n-gram
    Jaccard so the threshold is exact, LSH only affects recall.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, id_col, text_col, seed)
    bucketed = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.xxhash64(F.concat_ws(
                         ",", *[F.element_at("sig", i * rows_per_band + j + 1)
                                .cast("string")
                                for j in range(rows_per_band)])).alias("bucket"))
            for i in range(bands)])).alias("bb"))
    bkt = bucketed.select("doc_id", "bb.band", "bb.bucket")
    cand = (bkt.alias("x").join(bkt.alias("y"),
                                (F.col("x.band") == F.col("y.band"))
                                & (F.col("x.bucket") == F.col("y.bucket"))
                                & (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("doc_a"),
                    F.col("y.doc_id").alias("doc_b"))
            .distinct())
    g = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                    F.array_distinct(ngrams_col(tokens_col(text_col), n))
                     .alias("grams"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return (cand
            .join(g.select(F.col("doc_id").alias("doc_a"),
                           F.col("grams").alias("ga")), "doc_a")
            .join(g.select(F.col("doc_id").alias("doc_b"),
                           F.col("grams").alias("gb")), "doc_b")
            .select("doc_a", "doc_b",
                    (inter.cast("double") / union.cast("double")).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


_SIMHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("simhash", T.LongType(), False),
])


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "content") -> DataFrame:
    """64-bit SimHash per doc (token-hash bit voting), Arrow-vectorized."""
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       F.explode(tokens_col(text_col)).alias("tok"))
    hashed = base.withColumn("h", F.xxhash64("tok"))
    per_doc = hashed.groupBy("doc_id").agg(F.collect_list("h").alias("hs"))

    def kernel(it):
        for pdf in it:
            out_id = pdf["doc_id"].to_numpy(np.int64)
            sims = np.zeros(len(pdf), dtype=np.uint64)
            for i, hs in enumerate(pdf["hs"]):
                h = np.asarray(hs, dtype=np.int64).view(np.uint64)
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1)
                votes = bits.sum(axis=0) * 2 - len(h)
                sims[i] = np.sum((votes > 0).astype(np.uint64)
                                 << np.arange(64, dtype=np.uint64))
            yield pd.DataFrame({"doc_id": out_id,
                                "simhash": sims.view(np.int64)})

    return per_doc.mapInPandas(kernel, _SIMHASH_SCHEMA)


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "content") -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Banding: with 4 16-bit bands, any pair within hamming 3 shares at
    least one exact band (pigeonhole) — candidates via band equi-join,
    then exact popcount verify.
    """
    sh = simhash(docs, id_col, text_col)
    bands = sh.select("doc_id", "simhash", F.explode(F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned("simhash", 16 * i)
                  .bitwiseAND(F.lit(0xFFFF)).alias("key"))
        for i in range(4)])).alias("bb")).select("doc_id", "simhash",
                                                 "bb.band", "bb.key")
    cand = (bands.alias("x").join(bands.alias("y"),
                                  (F.col("x.band") == F.col("y.band"))
                                  & (F.col("x.key") == F.col("y.key"))
                                  & (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("doc_a"),
                    F.col("y.doc_id").alias("doc_b"),
                    F.col("x.simhash").alias("sa"),
                    F.col("y.simhash").alias("sb"))
            .distinct())
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (cand.select("doc_a", "doc_b", hamming.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))
