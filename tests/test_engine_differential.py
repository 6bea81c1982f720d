"""Differential tests: Spark engine vs the pure-pandas brute-force model.

Mirrors the reference's differential harness
(``TestPimIndexSearcher.checkPhraseQuery``, ``:820-860``): identical doc
order AND exact float score equality, swept over (partitions, segments, k)
configurations (``TestPimIndexSearcher.java:462-495``).
"""

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.model import BruteForceModel
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.operators.search import search

FIXTURE_DOCS = pd.DataFrame({
    "doc_id": range(6),
    "content": [
        "blah blah blah blah blah youpi blah blah blah",
        "red orange white orange red",
        "green red",
        "Une phrase a trouver ici Une phrase a trouver la " * 4,
        "Une phrase a ne pas trouver mais Une phrase a trouver quand meme",
        "one two three two one",
    ],
})

QUERIES = [
    (0, "blah blah"),
    (1, "blah blah blah"),
    (2, "blah youpi blah"),
    (3, "red"),
    (4, "orange"),
    (5, "Une phrase a trouver"),
    (6, "two one"),
    (7, "green red"),
    (8, "red nosuchterm"),
    (9, "a"),
]


def _spark_results(spark, index_dir, docs, queries, cfg, k, precision="float32"):
    sdf = spark.createDataFrame(docs)
    manifest = build_index(spark, sdf, index_dir, cfg,
                           content_col="content", id_col="doc_id")
    res = search(spark, manifest, queries, k=k, precision=precision).toPandas()
    return manifest, res


def _assert_matches_model(res, docs, queries, k, precision="float32"):
    model = BruteForceModel(docs)
    for qid, text in queries:
        expected = model.search_phrase(text, k=k, precision=precision)
        got = res[res.qid == qid].sort_values(
            ["score", "doc_id"], ascending=[False, True])
        assert got.doc_id.tolist() == expected.doc_id.tolist(), \
            f"doc order mismatch for {text!r}"
        assert got.freq.tolist() == expected.freq.tolist(), \
            f"freq mismatch for {text!r}"
        # Float.compare(score) == 0 semantics (TestPimIndexSearcher.java:852)
        np.testing.assert_array_equal(
            np.float32(got.score.to_numpy()),
            np.float32(expected.score.to_numpy()),
            err_msg=f"score mismatch for {text!r}")


@pytest.mark.parametrize("parts,segs,k", [
    (1, 1, 10), (2, 2, 10), (4, 2, 10), (3, 5, 2), (4, 1, 10000),
])
def test_engine_matches_model_fixture_sweep(spark, tmp_index_dir, parts, segs, k):
    cfg = IndexConfig(num_partitions=parts, num_segments=segs, build_chunks=2)
    _, res = _spark_results(spark, tmp_index_dir, FIXTURE_DOCS, QUERIES, cfg, k)
    _assert_matches_model(res, FIXTURE_DOCS, QUERIES, k)


def test_engine_matches_model_on_documents_table(spark, tmp_index_dir):
    docs = (pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
            [["doc_id", "text"]].rename(columns={"text": "content"}))
    queries = [
        (0, "merge"),
        (1, "the fast"),
        (2, "batch batch batch"),
        (3, "join order"),
        (4, "spark window window"),
        (5, "customer filter column fast fast"),
        (6, "zzz notfound"),
    ]
    cfg = IndexConfig(num_partitions=8, num_segments=4, build_chunks=3)
    manifest, res = _spark_results(spark, tmp_index_dir, docs, queries, cfg, k=10)
    _assert_matches_model(res, docs, queries, k=10)
    # per-row sha256 invariant vs the source table (north-rule)
    import hashlib
    stored = (spark.read.parquet(manifest.docs_path)
              .select("doc_id", "sha256").toPandas()
              .set_index("doc_id")["sha256"])
    for _, row in docs.head(50).iterrows():
        assert stored[row.doc_id] == hashlib.sha256(
            row.content.encode()).hexdigest()


def test_float64_precision_mode(spark, tmp_index_dir):
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1)
    queries = [(0, "blah blah"), (1, "red")]
    _, res = _spark_results(spark, tmp_index_dir, FIXTURE_DOCS, queries, cfg,
                            k=10, precision="float64")
    model = BruteForceModel(FIXTURE_DOCS)
    for qid, text in queries:
        expected = model.search_phrase(text, k=10, precision="float64")
        got = res[res.qid == qid].sort_values(
            ["score", "doc_id"], ascending=[False, True])
        np.testing.assert_allclose(got.score.to_numpy(),
                                   expected.score.to_numpy(), rtol=0, atol=0)


def test_hot_term_striping_equivalent(spark, tmp_index_dir):
    """Skew bound: a tiny stripe cap must split hot posting lists into
    multiple independently-decodable rows without changing any result."""
    cfg = IndexConfig(num_partitions=1, num_segments=2, build_chunks=1,
                      max_postings_per_stripe=1)
    manifest, res = _spark_results(spark, tmp_index_dir, FIXTURE_DOCS,
                                   QUERIES, cfg, k=10)
    postings = spark.read.parquet(manifest.chunk_path(0)).toPandas()
    assert postings["stripe"].max() >= 1, "expected at least one striped term"
    assert (postings["df"] <= 1).all(), "stripe cap exceeded"
    # global term stats still sum across stripes
    stats = spark.read.parquet(manifest.stats_path).toPandas()
    assert int(stats.set_index("term").loc["red", "doc_freq"]) == 2
    _assert_matches_model(res, FIXTURE_DOCS, QUERIES, k=10)


def test_resume_from_checkpoint_identical(spark, tmp_index_dir):
    """Kill-after-subset → resume → identical index (north rule)."""
    import glob
    import os
    import shutil

    cfg = IndexConfig(num_partitions=4, num_segments=2, build_chunks=4)
    sdf = spark.createDataFrame(FIXTURE_DOCS)
    manifest = build_index(spark, sdf, tmp_index_dir, cfg,
                           content_col="content", id_col="doc_id")
    full = search(spark, manifest, QUERIES, k=10).toPandas()

    # simulate a crash: drop the last two chunks + their markers
    for c in (2, 3):
        shutil.rmtree(manifest.chunk_path(c))
        os.remove(manifest.chunk_marker(c))
    manifest.completed_chunks = [0, 1]
    manifest.save()
    # stats are derived from postings → must be rebuilt on resume
    shutil.rmtree(manifest.stats_path, ignore_errors=True)
    os.remove(os.path.join(tmp_index_dir, "_STATS_DONE"))

    resumed = build_index(spark, sdf, tmp_index_dir, cfg,
                          content_col="content", id_col="doc_id", resume=True)
    assert sorted(resumed.completed_chunks) == [0, 1, 2, 3]
    res2 = search(spark, resumed, QUERIES, k=10).toPandas()
    pd.testing.assert_frame_equal(
        full.sort_values(["qid", "doc_id"]).reset_index(drop=True),
        res2.sort_values(["qid", "doc_id"]).reset_index(drop=True))


def test_segment_copresence_prune_correct(spark, tmp_index_dir):
    """Terms co-present in only one segment: the masked-decode path must
    return identical results to the model (pruning is exercised because
    docs are range-striped into segments and the phrase lives in one)."""
    docs = pd.DataFrame({
        "doc_id": range(12),
        "content": (["aaa zzz"] * 2            # seg 0: aaa + zzz
                    + ["aaa bbb"] * 4          # aaa everywhere
                    + ["bbb ccc"] * 4
                    + ["zzz aaa zzz aaa"] * 2),  # seg 3: both again
    })
    queries = [(0, "aaa zzz"), (1, "zzz aaa"), (2, "aaa"), (3, "bbb ccc")]
    cfg = IndexConfig(num_partitions=1, num_segments=4, build_chunks=1)
    _, res = _spark_results(spark, tmp_index_dir, docs, queries, cfg, k=10)
    _assert_matches_model(res, docs, queries, k=10)


def test_driver_merge_equals_window_merge(spark, tmp_index_dir):
    """The driver-side top-k merge (topdocs_sync.c host-merge analogue)
    must return exactly the window-rank result."""
    cfg = IndexConfig(num_partitions=4, num_segments=2, build_chunks=1)
    sdf = spark.createDataFrame(FIXTURE_DOCS)
    m = build_index(spark, sdf, tmp_index_dir, cfg,
                    content_col="content", id_col="doc_id")
    a = (search(spark, m, QUERIES, k=3, final_merge="window").toPandas()
         .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    b = (search(spark, m, QUERIES, k=3, final_merge="driver").toPandas()
         .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
