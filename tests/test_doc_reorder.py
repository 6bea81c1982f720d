"""Doc-ID reordering for postings compression (the classic URL/path-sort
trick): assigning ids in (repo, path) order clusters each repo-local
term's docs, shrinking docID gaps → smaller varints → fewer decode bytes
everywhere downstream.

The synthetic corpus draws a fraction of tokens from per-repo identifier
slices (``corpus.generate_corpus(repo_bias=...)``) so the effect is
measurable; a hash-random id order is the control.
"""

from pyspark.sql import functions as F

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.corpus import generate_corpus
from pim_lucene_spark.operators.index_build import build_index


def _total_bytes(manifest) -> int:
    return sum(p["bytes_compressed"]
               for p in manifest.metrics["per_partition"].values())


def test_repo_path_order_compresses_postings(spark, tmp_path):
    # the win appears once random-order docID gaps cross the varint byte
    # boundary (gap > 127): ~10k docs/partition with ~20 postings per
    # repo-local term gives ~500-doc gaps random vs ~5 ordered
    docs = generate_corpus(spark, 20_000, seed=7, vocab_size=5000,
                           min_tokens=30, max_tokens=100, num_partitions=8,
                           repo_bias=0.6).drop("doc_id").persist()
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1)
    ordered = build_index(spark, docs, str(tmp_path / "ordered"), cfg,
                          content_col="content", id_col=None,
                          order_cols=["repo", "path"])
    random = build_index(spark, docs, str(tmp_path / "random"), cfg,
                         content_col="content", id_col=None,
                         order_cols=["commit"])  # hash — id order random
    docs.unpersist()
    b_ord, b_rnd = _total_bytes(ordered), _total_bytes(random)
    assert b_ord < b_rnd, (b_ord, b_rnd)
    # the win should be real, not noise (delta-varint gaps shrink for
    # every repo-local term)
    assert b_ord < 0.97 * b_rnd, f"only {b_ord} vs {b_rnd}"
    # identical logical content: same doc/token totals
    assert ordered.doc_count == random.doc_count
    assert ordered.sum_total_term_freq == random.sum_total_term_freq


def test_repo_bias_content_deterministic(spark):
    a = generate_corpus(spark, 200, seed=3, repo_bias=0.4,
                        num_partitions=2).orderBy("doc_id").toPandas()
    b = generate_corpus(spark, 200, seed=3, repo_bias=0.4,
                        num_partitions=7).orderBy("doc_id").toPandas()
    assert (a.content == b.content).all()
    # biased tokens actually exist and are repo-local idents
    assert a.content.str.contains("v").any()


def test_search_identical_across_id_orders(spark, tmp_path):
    """Reordering changes ids, not results: the same query returns the
    same (content-keyed) docs and scores under either id assignment."""
    from pim_lucene_spark.operators.search import search
    docs = generate_corpus(spark, 800, seed=7, vocab_size=2000,
                           min_tokens=30, max_tokens=80, num_partitions=4,
                           repo_bias=0.5).persist()
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1)
    m_ord = build_index(spark, docs.drop("doc_id"),
                        str(tmp_path / "o2"), cfg, content_col="content",
                        id_col=None, order_cols=["repo", "path"])
    m_rnd = build_index(spark, docs.drop("doc_id"),
                        str(tmp_path / "r2"), cfg, content_col="content",
                        id_col=None, order_cols=["commit"])
    q = [(0, "def"), (1, "import return")]
    k_all = 10 ** 6

    def keyed(m):
        res = search(spark, m, q, k=k_all, precision="float64")
        d = spark.read.parquet(m.docs_path).select(
            "doc_id", F.col("sha256").alias("key"))
        return {(r["qid"], r["key"], round(r["score"], 9), r["freq"])
                for r in res.join(d, "doc_id").collect()}

    assert keyed(m_ord) == keyed(m_rnd)
    docs.unpersist()
