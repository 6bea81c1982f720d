"""Structured Streaming: incremental index builds + compaction, and
stateful training-data operators (cross-batch dedup, watermarked stats)."""

from pim_lucene_spark.streaming.ingest import (
    list_generations,
    merge_generations,
    stream_index,
)
from pim_lucene_spark.streaming.stateful import (
    stream_exact_dedup,
    stream_token_stats,
)

__all__ = ["stream_index", "list_generations", "merge_generations",
           "stream_exact_dedup", "stream_token_stats"]
