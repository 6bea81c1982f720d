"""Structured Streaming ingestion: incremental index builds + compaction."""

from pim_lucene_spark.streaming.ingest import (
    list_generations,
    merge_generations,
    stream_index,
)

__all__ = ["stream_index", "list_generations", "merge_generations"]
