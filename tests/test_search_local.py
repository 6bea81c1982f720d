"""Serving-path search (`search_local`): the same kernel with no Spark
job — the reference's resident-index query path (PimSystemManager.java:
401-437) for POSIX-visible indexes.  Must be row-identical to the
distributed path on every fixture, including misses and batches.
Measured ~1.4 ms/query warm vs ~250 ms through a Spark job at 100k docs.
"""

import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.operators.search import search, search_local
from tests.test_engine_differential import FIXTURE_DOCS, QUERIES


@pytest.fixture(scope="module")
def local_index(spark, tmp_path_factory):
    cfg = IndexConfig(num_partitions=3, num_segments=2, build_chunks=2)
    return build_index(spark, spark.createDataFrame(FIXTURE_DOCS),
                       str(tmp_path_factory.mktemp("locidx")), cfg,
                       content_col="content", id_col="doc_id")


@pytest.mark.parametrize("k", [1, 3, 10, 1000])
def test_local_equals_distributed(spark, local_index, k):
    a = (search(spark, local_index, QUERIES, k=k).toPandas()
         .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    b = (search_local(local_index, QUERIES, k=k)
         .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_local_no_match_and_empty(local_index):
    assert len(search_local(local_index, [(0, "zzznothere")], k=10)) == 0
    assert len(search_local(local_index, [], k=10)) == 0


def test_local_float64_mode(spark, local_index):
    a = (search(spark, local_index, QUERIES[:3], k=10,
                precision="float64").toPandas()
         .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    b = (search_local(local_index, QUERIES[:3], k=10, precision="float64")
         .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_facade_search_local(spark, local_index):
    from pim_lucene_spark import FullTextIndex
    idx = FullTextIndex(spark, local_index)
    res = idx.search_local(QUERIES[:2], k=5)
    assert set(res.columns) == {"qid", "doc_id", "freq", "norm", "score"}
    assert len(res) > 0


def test_local_rows_budget_eviction_never_drops_current_batch(
        spark, local_index):
    """Regression: with a tiny residency budget, the LRU pass used to
    evict terms the CURRENT batch needs (just-loaded or resident), and
    the kernel silently treated them as no-hit — partial results.  The
    eviction now runs after assembly with the batch's keys pinned."""
    import pim_lucene_spark.operators.search as S

    expected = (search_local(local_index, QUERIES, k=10)
                .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    old_max = S._LOCAL_ROWS_MAX
    S.clear_local_cache()
    try:
        S._LOCAL_ROWS_MAX = 1  # every batch is over budget
        for _ in range(3):  # repeated batches re-load after eviction
            got = (search_local(local_index, QUERIES, k=10)
                   .sort_values(["qid", "doc_id"]).reset_index(drop=True))
            pd.testing.assert_frame_equal(got, expected)
    finally:
        S._LOCAL_ROWS_MAX = old_max
        S.clear_local_cache()
