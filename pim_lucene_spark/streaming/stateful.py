"""Stateful streaming training-data operators.

The reference has no streaming surface (its only queue is the bounded
query batcher, ``PimSystemManager.java:265-281``); these operators cover
the streaming half of a training-data pipeline the Spark-native way:

- :func:`stream_exact_dedup` — cross-micro-batch exact deduplication as a
  custom stateful operator (``applyInPandasWithState``): per content-hash
  state remembers whether the hash was ever seen, so a duplicate arriving
  hours later in another batch is still dropped.  State is 8 bytes per
  distinct hash, partitioned by the shuffle on the hash — the same
  key-partitioned state layout a 1000-executor cluster checkpoints to its
  state store.
- :func:`stream_token_stats` — event-time windowed corpus statistics with
  a watermark for late data (built-in windowed aggregation: docs, tokens,
  average length per window).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEDUP_OUTPUT_SCHEMA = T.StructType([
    T.StructField("content_hash", T.StringType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("content", T.StringType(), False),
])

_DEDUP_STATE_SCHEMA = T.StructType([
    T.StructField("seen", T.LongType(), False),
])


def stream_exact_dedup(stream_df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "content") -> DataFrame:
    """First-seen exact dedup across micro-batches (append output).

    Emits one row per distinct ``sha256(content)`` — the lowest doc id of
    the earliest micro-batch that contained the hash — and nothing for
    later duplicates.  Use with ``outputMode("append")``.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    hashed = stream_df.select(
        F.sha2(F.col(text_col), 256).alias("content_hash"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("content"))

    def fn(key: tuple, pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        first_time = not state.exists
        seen = 0 if first_time else int(state.get[0])
        best = None
        n = 0
        for pdf in pdf_iter:
            n += len(pdf)
            if first_time and len(pdf):
                cand = pdf.loc[[pdf["doc_id"].idxmin()]]
                if best is None or (cand["doc_id"].iloc[0]
                                    < best["doc_id"].iloc[0]):
                    best = cand
        state.update((seen + n,))
        if first_time and best is not None:
            yield best[["content_hash", "doc_id", "content"]]

    return (hashed.groupBy("content_hash")
            .applyInPandasWithState(fn, DEDUP_OUTPUT_SCHEMA,
                                    _DEDUP_STATE_SCHEMA, "append",
                                    GroupStateTimeout.NoTimeout))


def stream_token_stats(stream_df: DataFrame, time_col: str = "event_time",
                       window: str = "1 minute",
                       watermark: str = "2 minutes",
                       text_col: str = "content") -> DataFrame:
    """Watermarked event-time windowed corpus stats.

    Late rows beyond ``watermark`` are dropped; each window reports doc
    count, total whitespace tokens and mean doc length — the streaming
    twin of the batch ``textstats.token_counts`` rollup.
    """
    toks = F.size(F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                           lambda x: x != ""))
    return (stream_df
            .withWatermark(time_col, watermark)
            .groupBy(F.window(F.col(time_col), window).alias("win"))
            .agg(F.count(F.lit(1)).alias("docs"),
                 F.sum(toks).alias("tokens"),
                 F.avg(toks).alias("avg_tokens"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "docs", "tokens", "avg_tokens"))
