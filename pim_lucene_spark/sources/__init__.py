"""Corpus sources: normalize any supported input format to the canonical
document frame the engine consumes."""

from pim_lucene_spark.sources.readers import CORPUS_FORMATS, read_corpus

__all__ = ["read_corpus", "CORPUS_FORMATS"]
