"""FullTextIndex facade: build/open/search/merge lifecycle."""

import os

import numpy as np
import pytest

from pim_lucene_spark import FullTextIndex, IndexConfig
from pim_lucene_spark.model import BruteForceModel
from tests.test_engine_differential import FIXTURE_DOCS


def test_facade_lifecycle(spark, tmp_index_dir):
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1)
    idx = FullTextIndex.build(spark, spark.createDataFrame(FIXTURE_DOCS),
                              os.path.join(tmp_index_dir, "a"), cfg,
                              id_col="doc_id")
    assert idx.doc_count == len(FIXTURE_DOCS)
    assert idx.verify_invariant(spark.createDataFrame(FIXTURE_DOCS)) == 0
    assert idx.term_stats().filter("term = 'red'").count() == 1
    assert "per_partition" in idx.metrics()

    model = BruteForceModel(FIXTURE_DOCS)
    got = (idx.search_phrase("blah blah", k=10).toPandas()
           .sort_values(["score", "doc_id"], ascending=[False, True]))
    exp = model.search_phrase("blah blah", k=10)
    assert got.doc_id.tolist() == exp.doc_id.tolist()
    np.testing.assert_array_equal(np.float32(got.score.to_numpy()),
                                  np.float32(exp.score.to_numpy()))

    reopened = FullTextIndex.open(spark, os.path.join(tmp_index_dir, "a"))
    assert reopened.doc_count == idx.doc_count
    assert reopened.search_term("red", k=5).count() == \
        idx.search_term("red", k=5).count()

    other = FullTextIndex.build(
        spark, spark.createDataFrame(FIXTURE_DOCS),
        os.path.join(tmp_index_dir, "b"), cfg, id_col="doc_id")
    merged = idx.merge_with(other, out_dir=os.path.join(tmp_index_dir, "m"))
    assert merged.doc_count == 2 * len(FIXTURE_DOCS)
    # each doc appears twice in the merged corpus → df doubles
    s = merged.term_stats().filter("term = 'red'").collect()[0]
    assert int(s["doc_freq"]) == 4


def test_facade_open_incomplete_raises(spark, tmp_index_dir):
    cfg = IndexConfig(num_partitions=2, num_segments=1, build_chunks=2)
    idx = FullTextIndex.build(spark, spark.createDataFrame(FIXTURE_DOCS),
                              tmp_index_dir, cfg, id_col="doc_id")
    idx.manifest.completed_chunks = [0]
    idx.manifest.save()
    with pytest.raises(ValueError, match="incomplete"):
        FullTextIndex.open(spark, tmp_index_dir)
