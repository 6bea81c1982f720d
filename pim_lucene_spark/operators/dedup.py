"""Deduplication operators for large-scale corpus curation.

Beyond the reference's capability set (pim-lucene has no dedup), these are
the standard operators a 100 TB training-data pipeline needs, expressed
Spark-first:

- ``exact_dedup``      : hash-groupBy on sha256(content) — one shuffle.
- ``ngram_jaccard_pairs``: exact token-n-gram Jaccard over a bounded
  candidate space — LSH-bucketed by default, manual equi-join blocking
  via ``block_col`` (SQL-checkable).
- ``minhash_lsh_pairs``  : MinHash signatures + banded LSH bucketing —
  the scale path: shuffles only O(docs × bands) bucket keys, never the
  O(n²) pair space; candidates verified with exact Jaccard.
- ``simhash_pairs``      : SimHash + banded hamming candidates; the
  signature itself is a ZERO-shuffle Catalyst fold per doc.

All hashing is deterministic (salted xxhash64, or the md5-based
``portable_hash60`` when a query needs a cross-engine SQL oracle), so
results are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens_col(text_col: str = "content"):
    """Whitespace tokens as array<string> (split + drop empties)."""
    return F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != "")


def portable_hash60(col, salt: int | None = None):
    """60-bit deterministic string hash computable identically in Spark SQL
    AND DuckDB: ``int(md5(salt ',' s)[:15], 16)``.

    Spark: ``conv(substr(md5(s), 1, 15), 16, 10)`` — DuckDB:
    ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``.  Weaker avalanche
    than xxhash64 per-bit, but md5 bits are uniform; use it when a query
    needs an exact cross-engine oracle.  15 hex chars keep the value inside
    a signed int64 on both engines.
    """
    s = col if salt is None else F.concat(F.lit(f"{salt},"), col)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str, salt: int | None = None) -> str:
    """The DuckDB side of :func:`portable_hash60`."""
    s = expr if salt is None else f"'{salt},' || {expr}"
    return f"CAST('0x' || substr(md5({s}), 1, 15) AS BIGINT)"


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
                        block_col: str | None = None,
                        lsh_num_hashes: int = 64,
                        lsh_bands: int = 32,
                        max_bucket_size: int | None = 10_000) -> DataFrame:
    """Exact token-n-gram Jaccard over a BOUNDED candidate pair space.

    Candidate generation (the Jaccard itself is always exact):

    - ``block_col=None`` (default): banded MinHash-LSH buckets
      (:func:`lsh_candidate_pairs`) — shuffles O(docs × bands) keys,
      never the O(n²) pair space, so the default is safe at corpus
      scale.  Candidate recall at the default 32 bands of 2 rows is
      ``1-(1-j²)³²`` (≈0.9999 at j=0.5); raise ``lsh_bands`` for lower
      thresholds.  The verify stage re-computes exact Jaccard, so
      reported pairs are never false positives.
    - ``block_col='...'``: manual equi-join blocking on a caller-chosen
      key (language, length bucket, shard) — exhaustive WITHIN blocks,
      the mode an exact-recall oracle run wants.  A constant block
      degenerates to the full self-join: keep blocks bounded.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b,
    jaccard >= threshold.
    """
    g = (docs.select(F.col(id_col).cast("long").alias("doc_id"),
                     F.array_distinct(ngrams_col(tokens_col(text_col), n))
                      .alias("grams")))
    if block_col is None:
        cand = lsh_candidate_pairs(docs, num_hashes=lsh_num_hashes,
                                   bands=lsh_bands, n=n, id_col=id_col,
                                   text_col=text_col,
                                   max_bucket_size=max_bucket_size)
        inter = F.size(F.array_intersect("ga", "gb"))
        union = F.size(F.array_union("ga", "gb"))
        return (cand
                .join(g.select(F.col("doc_id").alias("doc_a"),
                               F.col("grams").alias("ga")), "doc_a")
                .join(g.select(F.col("doc_id").alias("doc_b"),
                               F.col("grams").alias("gb")), "doc_b")
                .select("doc_a", "doc_b",
                        (inter.cast("double")
                         / union.cast("double")).alias("jaccard"))
                .filter(F.col("jaccard") >= threshold))
    gb = (docs.select(F.col(id_col).cast("long").alias("doc_id"),
                      F.col(block_col).alias("blk"))
          .join(g, "doc_id"))
    a = gb.alias("a")
    b = gb.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    jac = inter.cast("double") / union.cast("double")
    return (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def _gram_hash(k: int, seed: int, hash_fn: str):
    if hash_fn == "xxhash64":
        return F.xxhash64(F.lit(seed + k), F.col("gram"))
    if hash_fn == "portable":
        return portable_hash60(F.col("gram"), salt=seed + k)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def minhash_signatures(docs: DataFrame, num_hashes: int = 64, n: int = 3,
                       id_col: str = "doc_id", text_col: str = "content",
                       seed: int = 42,
                       hash_fn: str = "xxhash64") -> DataFrame:
    """(doc_id, sig array<long>) MinHash signatures over token n-grams.

    The k "permutations" are salted hashes (JVM-side, wrap-safe under ANSI
    mode); the whole signature build is one explode + one groupBy
    (map-side combinable min aggregates).  ``hash_fn='portable'`` uses the
    md5-based 60-bit hash reproducible in ANSI SQL (DuckDB oracles);
    ``'xxhash64'`` (default) is the faster production path.
    """
    sh = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                     F.explode(F.array_distinct(
                         ngrams_col(tokens_col(text_col), n))).alias("gram"))
    mins = [F.min(_gram_hash(k, seed, hash_fn)).alias(f"m{k}")
            for k in range(num_hashes)]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select("doc_id", F.array(*[f"m{k}" for k in range(num_hashes)])
                      .alias("sig"))


def _cap_buckets(bkt: DataFrame, keys: list[str],
                 max_bucket_size: int | None
                 ) -> tuple[DataFrame, DataFrame | None]:
    """Split LSH buckets at the cap before the self-join.

    At corpus scale a pathological bucket (site boilerplate, empty-ish
    docs) turns the within-bucket join quadratic: a 1M-doc bucket is 10¹²
    candidate pairs.  Returns ``(kept_buckets, dropped_doc_ids)`` — the
    members of oversized buckets are handed back so the caller can route
    them through the linear exact-duplicate star (see
    :func:`_exact_star_candidates`) instead of silently losing their
    pairs.  ``None`` disables the cap (``dropped`` is None)."""
    if max_bucket_size is None:
        return bkt, None
    from pyspark.sql import Window
    w = Window.partitionBy(*keys)
    sized = bkt.withColumn("_bsz", F.count(F.lit(1)).over(w))
    kept = sized.filter(F.col("_bsz") <= max_bucket_size).drop("_bsz")
    dropped = (sized.filter(F.col("_bsz") > max_bucket_size)
               .select("doc_id").distinct())
    return kept, dropped


def _exact_star_candidates(docs: DataFrame, dropped: DataFrame,
                           id_col: str, text_col: str) -> DataFrame:
    """Candidate pairs for oversized-bucket members: exact content
    duplicates linked in a star to each group's min doc_id.

    Oversized LSH buckets are near-certain boilerplate/exact duplicates;
    hash-grouping them is LINEAR (one shuffle on the content hash,
    size-1 pairs per group) where the within-bucket self-join is
    quadratic.  Near-but-not-exact duplicates inside an oversized bucket
    are the documented recall tradeoff at the quadratic cliff.  The pairs
    feed the caller's exact verify stage like any other candidates."""
    from pyspark.sql import Window
    d = (docs.select(F.col(id_col).cast("long").alias("doc_id"),
                     F.sha2(F.col(text_col), 256).alias("_h"))
         .join(dropped, "doc_id"))
    w = Window.partitionBy("_h")
    return (d.withColumn("_keep", F.min("doc_id").over(w))
            .filter(F.col("doc_id") != F.col("_keep"))
            .select(F.col("_keep").alias("doc_a"),
                    F.col("doc_id").alias("doc_b")))


def lsh_candidate_pairs(docs: DataFrame, num_hashes: int = 64,
                        bands: int = 16, n: int = 3,
                        id_col: str = "doc_id", text_col: str = "content",
                        seed: int = 42, hash_fn: str = "xxhash64",
                        max_bucket_size: int | None = 10_000) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) from banded MinHash LSH
    buckets — the shared bounded candidate generator behind
    :func:`minhash_lsh_pairs` and the :func:`ngram_jaccard_pairs`
    default.  Shuffles O(docs × bands) bucket keys, never the O(n²) pair
    space; oversized buckets route through the linear exact-duplicate
    star (:func:`_exact_star_candidates`)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, id_col, text_col, seed,
                             hash_fn)
    bucketed = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.concat_ws(
                         ",", *[F.element_at("sig", i * rows_per_band + j + 1)
                                .cast("string")
                                for j in range(rows_per_band)]).alias("bucket"))
            for i in range(bands)])).alias("bb"))
    bkt, dropped = _cap_buckets(
        bucketed.select("doc_id", "bb.band", "bb.bucket"),
        ["band", "bucket"], max_bucket_size)
    cand = (bkt.alias("x").join(bkt.alias("y"),
                                (F.col("x.band") == F.col("y.band"))
                                & (F.col("x.bucket") == F.col("y.bucket"))
                                & (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("doc_a"),
                    F.col("y.doc_id").alias("doc_b")))
    if dropped is not None:
        cand = cand.unionByName(
            _exact_star_candidates(docs, dropped, id_col, text_col))
    return cand.distinct()


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = 64, bands: int = 16,
                      n: int = 3, threshold: float = 0.5,
                      id_col: str = "doc_id", text_col: str = "content",
                      seed: int = 42,
                      hash_fn: str = "xxhash64",
                      max_bucket_size: int | None = 10_000) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH + exact Jaccard verify.

    Scale path: docs sharing any band bucket become candidates (shuffle on
    (band, bucket-key)); candidates are re-verified with exact n-gram
    Jaccard so the threshold is exact, LSH only affects recall.  The band
    bucket key is the concatenated signature slice itself (no second hash
    — exactly as collision-safe, and byte-for-byte reproducible in SQL).

    ``max_bucket_size`` (default 10⁴ — ON at scale) keeps pathological
    boilerplate buckets out of the quadratic self-join; their members are
    routed through the linear exact-duplicate star instead and still feed
    the same verify stage (see :func:`_exact_star_candidates`).  ``None``
    disables the cap entirely (small corpora / oracle runs).
    """
    cand = lsh_candidate_pairs(docs, num_hashes, bands, n, id_col,
                               text_col, seed, hash_fn, max_bucket_size)
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


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "content", num_bits: int = 64,
            hash_fn: str = "xxhash64") -> DataFrame:
    """SimHash per doc — computed entirely map-side with ZERO shuffle.

    SimHash is a per-doc function of the doc's own tokens, so it never
    needs a groupBy: tokens → per-token hash → bit-vote fold, all as
    Catalyst higher-order functions on the tokens array (one pass per doc,
    JVM-side, no Python, no exchange).  At 100 TB this runs as a pure map
    stage fused into whatever scan precedes it.

    ``hash_fn='portable'`` (md5-based 60-bit, see :func:`portable_hash60`)
    is bit-reproducible in ANSI SQL; ``'xxhash64'`` (default, 64-bit) is
    the fast path.
    """
    if hash_fn == "portable":
        num_bits = min(num_bits, 60)
        hashed = lambda t: portable_hash60(t)  # noqa: E731
    elif hash_fn == "xxhash64":
        hashed = lambda t: F.xxhash64(t)  # noqa: E731
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    toks = tokens_col(text_col)
    hashes = F.transform(toks, hashed)
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), num_bits),
        lambda acc, h: F.zip_with(
            acc, F.sequence(F.lit(0), F.lit(num_bits - 1)),
            lambda a, j: a + F.bit_get(h, j).cast("long")))
    n = F.size(toks)
    # bit j's signed-int64 value (bit 63 is the sign bit; disjoint bits
    # still sum to the correct two's-complement word)
    pow2 = F.array(*[
        F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long")
        for j in range(num_bits)])
    sim = F.aggregate(
        F.zip_with(votes, pow2,
                   lambda v, p: F.when(v * 2 > n, p)
                                 .otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    # docs with no tokens have no signature (the previous mapInPandas
    # implementation dropped them via explode; the SQL oracle filters
    # len(tks) > 0) — emitting sim=0 would report every empty doc as a
    # hamming-0 near-duplicate of every other
    return (docs.select(F.col(id_col).cast("long").alias("doc_id"),
                        n.alias("_n"), sim.alias("simhash"))
            .filter(F.col("_n") > 0).drop("_n"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "content",
                  num_bits: int = 64,
                  hash_fn: str = "xxhash64",
                  max_bucket_size: int | None = 10_000) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Banding: with 4 bands of num_bits/4 bits, any pair within hamming 3
    shares at least one exact band (pigeonhole) — candidates via band
    equi-join, then exact popcount verify.  ``max_bucket_size`` (default
    10⁴ — ON at scale) routes pathological boilerplate buckets through
    the linear exact-duplicate star instead of the quadratic self-join
    (exact dups have hamming 0; see :func:`_exact_star_candidates`);
    ``None`` disables the cap.
    """
    band_bits = num_bits // 4 if hash_fn != "portable" else 15
    sh = simhash(docs, id_col, text_col, num_bits, hash_fn)
    mask = (1 << band_bits) - 1
    bands = sh.select("doc_id", "simhash", F.explode(F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned("simhash", band_bits * i)
                  .bitwiseAND(F.lit(mask)).alias("key"))
        for i in range(4)])).alias("bb")).select("doc_id", "simhash",
                                                 "bb.band", "bb.key")
    bands, dropped = _cap_buckets(bands, ["band", "key"], max_bucket_size)
    # signatures ride THROUGH the self-join (recomputing simhash via a
    # post-join re-join against `sh` would re-run the corpus tokenize+hash
    # scan two extra times); only the (small) star-candidate set joins
    # back for its signatures
    cand = (bands.alias("x").join(bands.alias("y"),
                                  (F.col("x.band") == F.col("y.band"))
                                  & (F.col("x.key") == F.col("y.key"))
                                  & (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("doc_a"),
                    F.col("y.doc_id").alias("doc_b"),
                    F.col("x.simhash").alias("sa"),
                    F.col("y.simhash").alias("sb"))
            .distinct())
    if dropped is not None:
        star = (_exact_star_candidates(docs, dropped, id_col, text_col)
                .join(sh.select(F.col("doc_id").alias("doc_a"),
                                F.col("simhash").alias("sa")), "doc_a")
                .join(sh.select(F.col("doc_id").alias("doc_b"),
                                F.col("simhash").alias("sb")), "doc_b"))
        cand = cand.unionByName(star).distinct()
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (cand.select("doc_a", "doc_b", hamming.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def connected_components(pairs: DataFrame, a_col: str = "doc_a",
                         b_col: str = "doc_b",
                         max_iter: int = 50) -> DataFrame:
    """Transitive duplicate groups over a near-dup pair set:
    ``(doc_id, cluster_id)`` with ``cluster_id`` = the smallest doc id
    reachable through the pair graph (a canonical, deterministic
    component label).

    Iterative hash-min label propagation WITH pointer jumping — no
    graph library: every node starts labeled with itself; each round
    every node takes the min of its own label and its neighbors' labels
    (one shuffle keyed on the edge source), then shortcuts
    ``label ← label(label)`` (one self-join on the label frame — the
    pointer-doubling step of the Hash-to-Min family).  Labels only
    decrease, so the fixpoint is exact connected components; the
    shortcut makes convergence O(log diameter) rounds instead of
    O(diameter) — dedup graphs are near-cliques (2-4 rounds), and even
    a pathological 10⁶-long chain needs ~20.  Per round the shuffle is
    O(edges) + O(nodes), never the transitive closure.  Each round's
    frame is localCheckpoint-ed (lineage truncated — the iterative
    self-reference would otherwise double the logical plan per round
    and OOM the DRIVER at planning time).  Only nodes present in
    ``pairs`` appear (docs with no near-dup are their own implicit
    singleton clusters).
    """
    edges = (pairs.select(F.col(a_col).cast("long").alias("a"),
                          F.col(b_col).cast("long").alias("b"))
             .filter(F.col("a") != F.col("b")))
    edges = (edges.unionByName(edges.select(F.col("b").alias("a"),
                                            F.col("a").alias("b")))
             .distinct().persist())
    labels = (edges.select(F.col("a").alias("id"))
              .distinct()
              .withColumn("label", F.col("id"))
              .localCheckpoint(eager=True))
    try:
        for _ in range(max_iter):
            prop = (edges.join(labels, edges["a"] == labels["id"])
                    .select(F.col("b").alias("id"), "label"))
            mins = (labels.unionByName(prop)
                    .groupBy("id").agg(F.min("label").alias("label")))
            # pointer jumping: label ← label(label).  Every label IS a
            # node id (min over ids), so the inner self-join always
            # finds its row; label(label) ≤ label keeps monotonicity.
            lab2 = mins.select(F.col("id").alias("lid"),
                               F.col("label").alias("llabel"))
            # (On a cluster with a configured checkpoint dir,
            # `checkpoint()` adds executor-loss tolerance; local mode
            # has no such loss to tolerate.)
            new = (mins.join(lab2, mins["label"] == lab2["lid"])
                   .select("id", F.col("llabel").alias("label"))
                   .localCheckpoint(eager=True))
            changed = (new.join(labels.withColumnRenamed("label", "old"),
                                "id")
                       .filter(F.col("label") < F.col("old")).count())
            labels = new
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "rounds — pathological graph diameter; raise max_iter")
        return labels.select(F.col("id").alias("doc_id"),
                             F.col("label").alias("cluster_id"))
    finally:
        edges.unpersist(blocking=False)


def dedup_clusters(pairs: DataFrame, a_col: str = "doc_a",
                   b_col: str = "doc_b",
                   max_iter: int = 50) -> DataFrame:
    """Cluster view of a near-dup pair set: ``(doc_id, cluster_id,
    cluster_size)``, one row per clustered doc, ``cluster_id`` = the
    component's smallest doc id.  See :func:`connected_components`."""
    comp = connected_components(pairs, a_col, b_col, max_iter)
    sizes = comp.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"))
    return comp.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size")


def drop_duplicates_clustered(docs: DataFrame, pairs: DataFrame,
                              id_col: str = "doc_id",
                              a_col: str = "doc_a", b_col: str = "doc_b",
                              prefer_col: str | None = None,
                              max_iter: int = 50) -> DataFrame:
    """The actual dedup step a training pipeline runs: resolve the pair
    set into transitive clusters and keep ONE canonical doc per cluster
    (plus every unclustered doc).

    Canonical pick: the cluster's smallest doc id, or — when
    ``prefer_col`` is given (e.g. a quality score or text length) — the
    member with the highest ``prefer_col`` value, ties broken by
    smallest doc id.  Returns ``docs`` filtered to survivors, original
    schema unchanged.  One component resolution + one left-anti join;
    no shuffle touches the (wide) doc payload except the final anti-join
    on ids.
    """
    from pyspark.sql import Window
    comp = connected_components(pairs, a_col, b_col, max_iter)
    # canonical selection happens among the cluster members PRESENT in
    # ``docs`` — pairs may reference docs a prior gate already dropped,
    # and the cluster must still keep one survivor (ranking only
    # comp.filter(doc_id != cluster_id) would delete a whole cluster
    # whenever its min-id member was filtered out upstream)
    if prefer_col is None:
        pref = (docs.select(F.col(id_col).cast("long").alias("doc_id"))
                .distinct())
        w = Window.partitionBy("cluster_id").orderBy(F.asc("doc_id"))
    else:
        # one row per id even when docs carries duplicate-id rows (the
        # very input a dedup pipeline ingests) — otherwise the second
        # copy of the canonical id ranks > 1 and the anti-join would
        # delete the canonical itself
        pref = (docs.select(F.col(id_col).cast("long").alias("doc_id"),
                            F.col(prefer_col).alias("_pref"))
                .groupBy("doc_id").agg(F.max("_pref").alias("_pref")))
        w = (Window.partitionBy("cluster_id")
             .orderBy(F.desc("_pref"), F.asc("doc_id")))
    ranked = (comp.join(pref, "doc_id")
              .withColumn("_rn", F.row_number().over(w)))
    losers = ranked.filter(F.col("_rn") > 1).select("doc_id")
    return docs.join(
        losers.select(F.col("doc_id").alias(id_col)).distinct(),
        id_col, "left_anti")
