"""pim_lucene_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch rebuild of the capabilities of upmem/pim-lucene (a Lucene
fork with a Processing-In-Memory offload for exact phrase search) on top of
Apache Spark DataFrames, Arrow-vectorized pandas UDFs and Parquet segment
files.  Reference semantics are cited per module as ``file:line`` paths under
``/root/reference``; the implementation is Spark-first, not a port.

Layout
------
- ``functions``  : pure numpy/pandas kernels (codecs, BM25 math, tokenizers)
- ``operators``  : DataFrame-level jobs (index build, merge, search, dedup,
                   similarity, text stats, multimodal plumbing)
- ``plans``      : query routing / rewrite (indexed path vs brute force)
- ``streaming``  : Structured Streaming ingestion helpers
"""

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.index import FullTextIndex, MultiFieldIndex
from pim_lucene_spark.manifest import IndexManifest
from pim_lucene_spark.plans.boolean import BooleanQuery
from pim_lucene_spark.plans.dismax import DisMaxQuery
from pim_lucene_spark.plans.multiterm import (FuzzyQuery, PrefixQuery,
                                              RegexpQuery, TermRangeQuery,
                                              WildcardQuery)
from pim_lucene_spark.plans.parser import apply_synonyms, parse_query
from pim_lucene_spark.plans.query import (ConstantScoreQuery,
                                          DocValuesRangeQuery,
                                          FacetFilterQuery, IntervalQuery,
                                          MatchAllDocsQuery, PhraseQuery,
                                          SynonymQuery, TermQuery)

__all__ = ["FullTextIndex", "IndexConfig", "IndexManifest",
           "MultiFieldIndex", "PhraseQuery", "TermQuery", "BooleanQuery",
           "DisMaxQuery", "PrefixQuery", "WildcardQuery", "TermRangeQuery",
           "RegexpQuery", "FuzzyQuery", "MatchAllDocsQuery",
           "ConstantScoreQuery", "SynonymQuery", "FacetFilterQuery",
           "DocValuesRangeQuery", "IntervalQuery", "parse_query",
           "apply_synonyms"]
__version__ = "0.5.0"
