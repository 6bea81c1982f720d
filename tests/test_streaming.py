"""Structured Streaming ingestion: per-micro-batch index generations +
Lucene-style compaction, verified against the brute-force model over the
compacted corpus."""

import os

import numpy as np
import pandas as pd

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.model import BruteForceModel
from pim_lucene_spark.operators.search import search
from pim_lucene_spark.streaming import (
    list_generations,
    merge_generations,
    stream_exact_dedup,
    stream_index,
    stream_token_stats,
)
from tests.test_engine_differential import FIXTURE_DOCS

MORE_DOCS = pd.DataFrame({
    "doc_id": range(4),
    "content": [
        "stream one stream two",
        "red stream blah",
        "orange white red orange",
        "two one blah blah",
    ],
})
QUERIES = [(0, "blah blah"), (1, "red"), (2, "stream"), (3, "orange white red"),
           (4, "two one")]


def test_stream_generations_and_compaction(spark, tmp_index_dir, tmp_path):
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    # two files → two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(FIXTURE_DOCS[["content"]]).coalesce(1) \
        .write.parquet(os.path.join(src, "f0"))
    spark.createDataFrame(MORE_DOCS[["content"]]).coalesce(1) \
        .write.parquet(os.path.join(src, "f1"))

    stream = (spark.readStream
              .schema("content string")
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "*")))
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1)
    q = stream_index(stream, tmp_index_dir, cfg, content_col="content",
                     id_col=None, trigger_available_now=True,
                     query_name="test_stream_index")
    q.awaitTermination(120)

    gens = list_generations(tmp_index_dir)
    assert len(gens) == 2, f"expected 2 generations, got {gens}"

    merged = merge_generations(spark, tmp_index_dir)
    assert merged.doc_count == len(FIXTURE_DOCS) + len(MORE_DOCS)

    # oracle corpus = exactly the merged docs table (id assignment and
    # generation order come from the stream)
    corpus = (spark.read.parquet(merged.docs_path)
              .select("doc_id", "content").toPandas()
              .sort_values("doc_id").reset_index(drop=True))
    model = BruteForceModel(corpus)
    res = search(spark, merged, QUERIES, k=10).toPandas()
    for qid, text in QUERIES:
        expected = model.search_phrase(text, k=10)
        got = res[res.qid == qid].sort_values(
            ["score", "doc_id"], ascending=[False, True])
        assert got.doc_id.tolist() == expected.doc_id.tolist(), text
        assert got.freq.tolist() == expected.freq.tolist(), text
        np.testing.assert_array_equal(
            np.float32(got.score.to_numpy()),
            np.float32(expected.score.to_numpy()), err_msg=text)


def test_single_generation_merge_is_identity(spark, tmp_index_dir, tmp_path):
    src = str(tmp_path / "incoming1")
    os.makedirs(src)
    spark.createDataFrame(FIXTURE_DOCS[["content"]]).coalesce(1) \
        .write.parquet(os.path.join(src, "f0"))
    stream = (spark.readStream.schema("content string")
              .parquet(os.path.join(src, "*")))
    q = stream_index(stream, tmp_index_dir,
                     IndexConfig(num_partitions=2, num_segments=1,
                                 build_chunks=1),
                     content_col="content", id_col=None,
                     query_name="test_stream_single")
    q.awaitTermination(120)
    gens = list_generations(tmp_index_dir)
    assert len(gens) == 1
    m = merge_generations(spark, tmp_index_dir)
    assert m.index_dir == gens[0]


def test_stream_exact_dedup_across_batches(spark, tmp_path):
    """Cross-micro-batch stateful dedup: a duplicate arriving in a LATER
    batch is dropped; the keeper is the lowest doc_id of the earliest
    batch that contained the hash."""
    src = str(tmp_path / "dedup_in")
    os.makedirs(src)
    b0 = pd.DataFrame({"doc_id": [3, 1, 2],
                       "content": ["aaa", "bbb", "aaa"]})
    b1 = pd.DataFrame({"doc_id": [10, 11, 0],
                       "content": ["aaa", "ccc", "bbb"]})
    spark.createDataFrame(b0).coalesce(1).write.parquet(os.path.join(src, "f0"))
    spark.createDataFrame(b1).coalesce(1).write.parquet(os.path.join(src, "f1"))

    stream = (spark.readStream
              .schema("doc_id long, content string")
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "*")))
    q = (stream_exact_dedup(stream).writeStream
         .format("memory").queryName("dedup_out").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    out = spark.sql("SELECT * FROM dedup_out").toPandas()
    kept = dict(zip(out.content, out.doc_id))
    # file order is lexicographic (f0 first): "aaa" keeper is min(3, 2)=2
    # from batch 0 — NOT 10 from batch 1; "bbb" keeper is 1, not 0
    assert len(out) == 3
    assert kept["aaa"] in (2, 3) and kept["aaa"] == 2
    assert kept["bbb"] == 1
    assert kept["ccc"] == 11


def test_stream_token_stats_windowed(spark, tmp_path):
    src = str(tmp_path / "stats_in")
    os.makedirs(src)
    rows = pd.DataFrame({
        "event_time": pd.to_datetime([
            "2026-01-01 00:00:10", "2026-01-01 00:00:40",
            "2026-01-01 00:01:10", "2026-01-01 00:05:00",
        ]),
        "content": ["a b c", "d e", "f", "g h i j"],
    })
    spark.createDataFrame(rows).coalesce(1).write.parquet(
        os.path.join(src, "f0"))
    stream = (spark.readStream
              .schema("event_time timestamp, content string")
              .parquet(os.path.join(src, "*")))
    q = (stream_token_stats(stream, window="1 minute",
                            watermark="2 minutes").writeStream
         .format("memory").queryName("stats_out").outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = (spark.sql("SELECT * FROM stats_out").toPandas()
           .sort_values("window_start").reset_index(drop=True))
    assert out.docs.tolist() == [2, 1, 1]
    assert out.tokens.tolist() == [5, 1, 4]
