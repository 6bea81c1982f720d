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


def test_typed_queries_and_boost(spark, tmp_index_dir):
    """PhraseQuery/TermQuery objects + Lucene BoostQuery semantics:
    weight = float32(boost) * float32(Σ idf), scores scale accordingly."""
    import os

    from pim_lucene_spark import FullTextIndex, IndexConfig, PhraseQuery, TermQuery
    from pim_lucene_spark.functions import bm25

    cfg = IndexConfig(num_partitions=2, num_segments=1, build_chunks=1)
    idx = FullTextIndex.build(spark, spark.createDataFrame(FIXTURE_DOCS),
                              os.path.join(tmp_index_dir, "tq"), cfg,
                              id_col="doc_id")
    base = (idx.query([(0, TermQuery("red")),
                       (1, PhraseQuery("blah blah"))], k=10)
            .toPandas().sort_values(["qid", "doc_id"]).reset_index(drop=True))
    boosted = (idx.query([(0, TermQuery("red", boost=2.5)),
                          (1, PhraseQuery("blah blah", boost=2.5))], k=10)
               .toPandas().sort_values(["qid", "doc_id"])
               .reset_index(drop=True))
    assert base.doc_id.tolist() == boosted.doc_id.tolist()
    # exact float32 BoostQuery math: recompute the boosted score from the
    # stored (freq, norm) with the boosted weight
    m = idx.manifest
    avgdl = bm25.avg_field_length(m.sum_total_term_freq, m.doc_count)
    cache = bm25.score_cache(avgdl, m.k1, m.b)
    import duckdb  # noqa: F401  (env sanity: duckdb present)
    stats = idx.term_stats().toPandas().set_index("term")
    for qid, terms in ((0, ["red"]), (1, ["blah", "blah"])):
        dfs = np.array([int(stats.loc[t, "doc_freq"]) for t in terms])
        w = bm25.phrase_weight(dfs, m.doc_count, boost=2.5)
        sub = boosted[boosted.qid == qid]
        expect = bm25.score(sub.freq.to_numpy(), sub.norm.to_numpy(),
                            w, cache)
        np.testing.assert_array_equal(np.float32(sub.score.to_numpy()),
                                      np.float32(expect))

    # sloppy typed query routes to the scan (float freq), never raises
    sloppy = idx.query([(0, PhraseQuery("red white", slop=2))], k=10)
    assert dict(sloppy.toPandas().dtypes)["freq"] == np.dtype("float64")

    # boost plumbed through the fallback path too
    from pim_lucene_spark.plans.router import brute_force_search
    bf = brute_force_search(spark.createDataFrame(FIXTURE_DOCS),
                            [(0, "red", 2.5)], k=10).toPandas()
    sub = boosted[boosted.qid == 0].reset_index(drop=True)
    bf = bf.sort_values("doc_id").reset_index(drop=True)
    np.testing.assert_array_equal(np.float32(bf.score.to_numpy()),
                                  np.float32(sub.score.to_numpy()))


def test_mixed_slop_batch_splits_and_unions(spark, tmp_index_dir):
    import os

    from pim_lucene_spark import FullTextIndex, IndexConfig, PhraseQuery

    cfg = IndexConfig(num_partitions=2, num_segments=1, build_chunks=1)
    idx = FullTextIndex.build(spark, spark.createDataFrame(FIXTURE_DOCS),
                              os.path.join(tmp_index_dir, "mix"), cfg,
                              id_col="doc_id")
    res = (idx.query([(0, PhraseQuery("blah blah")),          # exact
                      (1, PhraseQuery("red white", slop=2)),  # sloppy
                      (2, PhraseQuery("red"))], k=10)
           .toPandas())
    assert dict(res.dtypes)["freq"] == np.dtype("float64")
    assert set(res.qid) >= {0, 2}
    # exact rows agree with the plain search path (freq upcast only)
    exact = idx.search([(0, "blah blah"), (2, "red")], k=10).toPandas()
    for qid in (0, 2):
        a = (res[res.qid == qid].sort_values("doc_id")
             .reset_index(drop=True))
        b = (exact[exact.qid == qid].sort_values("doc_id")
             .reset_index(drop=True))
        assert a.doc_id.tolist() == b.doc_id.tolist()
        np.testing.assert_array_equal(a.freq.to_numpy(),
                                      b.freq.to_numpy().astype(float))
