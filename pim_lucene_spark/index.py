"""User-facing facade: the engine's `IndexWriter`/`IndexSearcher` analogue.

The reference's user surface is Lucene's: build via ``IndexWriter`` +
``PimIndexWriter`` hook, query via ``IndexSearcher.search(PimPhraseQuery
(field, terms...), k)`` (``TestPimIndexSearcher.java:77-164``).  The Spark
engine's one-object equivalent:

    idx = FullTextIndex.build(spark, docs_df, "/path/idx",
                              IndexConfig(num_partitions=2048))
    hits = idx.search([(0, "def main"), (1, "import os")], k=10)
    one  = idx.search_phrase("exact phrase here", k=10)
    idx2 = FullTextIndex.open(spark, "/path/idx")
    merged = idx.merge_with(other, out_dir="/path/merged")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.manifest import IndexManifest


class FullTextIndex:
    """Handle to a built index: search, stats, invariants, merging."""

    def __init__(self, spark: SparkSession, manifest: IndexManifest):
        self.spark = spark
        self.manifest = manifest

    # --- lifecycle ---------------------------------------------------------
    @classmethod
    def build(cls, spark: SparkSession, docs: DataFrame, index_dir: str,
              cfg: IndexConfig = IndexConfig(), *, content_col: str = "content",
              id_col: str | None = None, resume: bool = False,
              source: str = "") -> "FullTextIndex":
        from pim_lucene_spark.operators.index_build import build_index
        return cls(spark, build_index(spark, docs, index_dir, cfg,
                                      content_col=content_col, id_col=id_col,
                                      resume=resume, source=source))

    @classmethod
    def open(cls, spark: SparkSession, index_dir: str) -> "FullTextIndex":
        m = IndexManifest.load(index_dir)
        if len(m.completed_chunks) != m.build_chunks:
            raise ValueError(
                f"index at {index_dir} is incomplete "
                f"({len(m.completed_chunks)}/{m.build_chunks} chunks); "
                "resume the build or search with the fallback router")
        return cls(spark, m)

    def merge_with(self, *others: "FullTextIndex", out_dir: str,
                   num_segments: int | None = None) -> "FullTextIndex":
        from pim_lucene_spark.operators.merge import merge_indexes
        manifests = [self.manifest] + [o.manifest for o in others]
        return FullTextIndex(self.spark, merge_indexes(
            self.spark, manifests, out_dir, num_segments=num_segments))

    # --- queries -----------------------------------------------------------
    def search(self, queries: list[tuple[int, str]], k: int = 10,
               precision: str = "float32") -> DataFrame:
        """Batched phrase/term BM25 top-k → (qid, doc_id, freq, norm, score)."""
        from pim_lucene_spark.operators.search import search
        return search(self.spark, self.manifest, queries, k=k,
                      precision=precision)

    def search_phrase(self, text: str, k: int = 10,
                      precision: str = "float32") -> DataFrame:
        return self.search([(0, text)], k=k, precision=precision).drop("qid")

    def search_term(self, term: str, k: int = 10 ** 9,
                    precision: str = "float32") -> DataFrame:
        return self.search([(0, term)], k=k, precision=precision).drop("qid")

    # --- introspection -----------------------------------------------------
    @property
    def doc_count(self) -> int:
        return self.manifest.doc_count

    def docs(self) -> DataFrame:
        return self.spark.read.parquet(self.manifest.docs_path)

    def term_stats(self) -> DataFrame:
        return self.spark.read.parquet(self.manifest.stats_path)

    def metrics(self) -> dict:
        return dict(self.manifest.metrics)

    def verify_invariant(self, source_df: DataFrame,
                         content_col: str = "content",
                         id_col: str = "doc_id") -> int:
        """Per-row sha256(content) violations vs the source (0 == holds)."""
        from pim_lucene_spark.operators.index_build import (
            verify_content_invariant,
        )
        return verify_content_invariant(self.spark, self.manifest, source_df,
                                        content_col=content_col,
                                        id_col=id_col)
