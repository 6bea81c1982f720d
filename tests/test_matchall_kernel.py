"""MatchAllDocs in the compound kernel + bounded join-chain frames.

Round-5 scale fix (VERDICT r4 item 1): *:* clauses host in-kernel as a
constant per-doc contribution (never a materialized docs frame) and
ConstantScoreQuery wrappers rewrite to must=[*:*(boost)]+filter=[inner]
so they ride the same per-partition-top-k plan; the join-chain fallback
bounds its matchall frame to other-clause docs ∪ k-smallest-of-rest.
Reference: MatchAllDocsQuery's scorer is a constant iterator
(``MatchAllDocsQuery.java``), never a collected doc set.
"""

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.plans.boolean import (BooleanQuery, _matchall_frame,
                                            search_boolean)
from pim_lucene_spark.plans.query import (ConstantScoreQuery,
                                          MatchAllDocsQuery, PhraseQuery)

DOCS = pd.DataFrame({
    "doc_id": range(12),
    "content": ["red apple", "green pear", "red plum", "blue sky",
                "red sun", "pink dawn", "apple tart", "red apple pie",
                "sky blue", "sun red", "dawn red", "plum pie"],
})

BATCH = [
    (0, BooleanQuery(must=[MatchAllDocsQuery(boost=2.0)])),
    (1, BooleanQuery(must=["red"], should=[MatchAllDocsQuery()])),
    (2, BooleanQuery(should=[MatchAllDocsQuery()], must_not=["red"])),
    (3, BooleanQuery(must=[MatchAllDocsQuery(boost=1.5)],
                     filter=["apple"])),
]


@pytest.fixture(scope="module")
def midx(spark, tmp_path_factory):
    return build_index(spark, spark.createDataFrame(DOCS),
                       str(tmp_path_factory.mktemp("maidx")),
                       IndexConfig(3, 2, build_chunks=1),
                       content_col="content", id_col="doc_id")


def test_matchall_kernel_equals_join(spark, midx):
    kern = search_boolean(spark, midx, BATCH, k=5,
                          plan="kernel").toPandas()
    join = search_boolean(spark, midx, BATCH, k=5, plan="join").toPandas()
    a = kern.sort_values(["qid", "doc_id"]).reset_index(drop=True)
    b = join.sort_values(["qid", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # pure *:* boost=2: the 5 smallest doc ids at score 2.0
    q0 = a[a.qid == 0]
    assert list(q0.doc_id) == [0, 1, 2, 3, 4]
    assert (q0.score == 2.0).all()


def test_matchall_serving_equals_kernel(spark, midx):
    from pim_lucene_spark.plans.compound import search_compound_local
    kern = (search_boolean(spark, midx, BATCH, k=5, plan="kernel")
            .toPandas().sort_values(["qid", "doc_id"])
            .reset_index(drop=True))
    loc = (search_compound_local(midx, BATCH, k=5)
           .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(kern, loc.astype(kern.dtypes.to_dict()))


def test_matchall_honors_deletes_all_routes(spark, midx, tmp_path):
    from pim_lucene_spark.operators.deletes import write_deletes
    from pim_lucene_spark.plans.compound import (count_compound,
                                                 search_compound_local)
    m = build_index(spark, spark.createDataFrame(DOCS),
                    str(tmp_path / "madel"), IndexConfig(3, 2,
                                                         build_chunks=1),
                    content_col="content", id_col="doc_id")
    m = write_deletes(spark, m, [0, 1, 2])
    kern = search_boolean(spark, m, BATCH, k=6, plan="kernel").toPandas()
    join = search_boolean(spark, m, BATCH, k=6, plan="join").toPandas()
    loc = search_compound_local(m, BATCH, k=6)
    for res in (kern, join, loc):
        assert not set(res.doc_id) & {0, 1, 2}
    a = kern.sort_values(["qid", "doc_id"]).reset_index(drop=True)
    b = join.sort_values(["qid", "doc_id"]).reset_index(drop=True)
    c = loc.sort_values(["qid", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c.astype(a.dtypes.to_dict()))
    counts = count_compound(spark, {"": m}, "", BATCH)
    assert counts[0] == 9        # 12 docs - 3 deleted


def test_wrappers_route_kernel_not_join(spark, midx, monkeypatch):
    """MatchAllDocs + ConstantScore(kernelable inner) wrappers must never
    reach the join-chain plan (the old path shipped the inner match set
    at k=10**9 / a docs-table crossJoin)."""
    import pim_lucene_spark.plans.boolean as B
    from pim_lucene_spark.index import FullTextIndex

    def boom(*a, **kw):
        raise AssertionError("join-chain plan reached for a kernelable "
                             "wrapper batch")

    monkeypatch.setattr(B, "_search_boolean_join", boom)
    idx = FullTextIndex(spark, midx)
    res = idx.query([
        (0, MatchAllDocsQuery(boost=3.0)),
        (1, ConstantScoreQuery(PhraseQuery("red apple"), boost=2.0)),
        (2, ConstantScoreQuery(PhraseQuery("apple"), boost=0.5)),
    ], k=4, precision="float64").toPandas()
    assert list(res[res.qid == 0].doc_id) == [0, 1, 2, 3]
    assert (res[res.qid == 0].score == 3.0).all()
    assert sorted(res[res.qid == 1].doc_id) == [0, 7]
    assert (res[res.qid == 1].score == 2.0).all()
    assert sorted(res[res.qid == 2].doc_id) == [0, 6, 7]
    assert (res[res.qid == 2].score == 0.5).all()


def test_parsed_matchall_routes_kernel(spark, midx):
    """Every parsed-query route containing *:* is kernel-hostable — no
    clause frame of any kind (plan='kernel' would raise otherwise)."""
    from pim_lucene_spark.plans.parser import parse_query
    for s in ("*:* -red", "red *:*", "+apple *:*", "(red *:*) +apple"):
        q = parse_query(s)
        res = search_boolean(spark, midx, [(0, q)], k=5,
                             plan="kernel").toPandas()
        join = search_boolean(spark, midx, [(0, q)], k=5,
                              plan="join").toPandas()
        a = res.sort_values("doc_id").reset_index(drop=True)
        b = join.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_join_matchall_frame_is_bounded(spark, midx):
    """The join-chain matchall frame ships |other_docs| + k ids per
    matchall sid — never the whole docs table (for bounded k)."""
    others = spark.createDataFrame(
        [(0, 5, 1.0), (0, 7, 0.5)], "sid long, doc_id long, score double")
    ma = [(1, 2.0)]
    frame = _matchall_frame(spark, midx, ma, others, k=3).toPandas()
    # {5,7} from others ∪ {0,1,2} (3 smallest of the rest) = 5 ids
    assert sorted(frame.doc_id) == [0, 1, 2, 5, 7]
    assert (frame.score == 2.0).all()
    # huge k (nested clause evaluation) falls back to the full id scan
    full = _matchall_frame(spark, midx, ma, others, k=10 ** 9)
    assert full.count() == len(DOCS)
    # no others: the k smallest ids alone
    solo = _matchall_frame(spark, midx, ma, None, k=4).toPandas()
    assert sorted(solo.doc_id) == [0, 1, 2, 3]
