"""Query routing (Q1 rewrite semantics) + brute-force CPU-fallback path
(Q23): route decisions, and score/rank equality between the indexed kernel,
the brute-force DataFrame scan, and the pure-pandas model."""

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.model import BruteForceModel
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.plans import QueryRoute, route_query, search_with_fallback
from pim_lucene_spark.plans.router import brute_force_search
from tests.test_engine_differential import FIXTURE_DOCS, QUERIES


def test_route_decisions(spark, tmp_index_dir):
    assert route_query(None) is QueryRoute.BRUTE_FORCE
    assert route_query(None, slop=1) is QueryRoute.BRUTE_FORCE
    assert route_query(tmp_index_dir) is QueryRoute.BRUTE_FORCE  # no manifest
    cfg = IndexConfig(num_partitions=2, num_segments=1, build_chunks=1)
    m = build_index(spark, spark.createDataFrame(FIXTURE_DOCS), tmp_index_dir,
                    cfg, content_col="content", id_col="doc_id")
    assert route_query(m) is QueryRoute.INDEXED
    assert route_query(tmp_index_dir) is QueryRoute.INDEXED
    assert route_query(m, slop=2) is QueryRoute.BRUTE_FORCE
    m.completed_chunks = []
    assert route_query(m) is QueryRoute.BRUTE_FORCE  # generation not ready


def test_brute_force_matches_model(spark):
    docs = spark.createDataFrame(FIXTURE_DOCS)
    res = brute_force_search(docs, QUERIES, k=10).toPandas()
    model = BruteForceModel(FIXTURE_DOCS)
    for qid, text in QUERIES:
        expected = model.search_phrase(text, k=10)
        got = res[res.qid == qid].sort_values(
            ["score", "doc_id"], ascending=[False, True])
        assert got.doc_id.tolist() == expected.doc_id.tolist(), text
        assert got.freq.tolist() == expected.freq.tolist(), text
        np.testing.assert_array_equal(
            np.float32(got.score.to_numpy()),
            np.float32(expected.score.to_numpy()), err_msg=text)


def test_fallback_equals_indexed(spark, tmp_index_dir):
    cfg = IndexConfig(num_partitions=3, num_segments=2, build_chunks=1)
    sdf = spark.createDataFrame(FIXTURE_DOCS)
    m = build_index(spark, sdf, tmp_index_dir, cfg,
                    content_col="content", id_col="doc_id")
    via_index = (search_with_fallback(spark, m, None, QUERIES, k=10)
                 .toPandas().sort_values(["qid", "doc_id"])
                 .reset_index(drop=True))
    via_scan = (search_with_fallback(spark, None, sdf, QUERIES, k=10)
                .toPandas().sort_values(["qid", "doc_id"])
                .reset_index(drop=True))
    pd.testing.assert_frame_equal(via_index, via_scan)


def test_slop_not_supported(spark):
    with pytest.raises(NotImplementedError):
        search_with_fallback(spark, None, spark.createDataFrame(FIXTURE_DOCS),
                             [(0, "red orange")], k=10, slop=1)
