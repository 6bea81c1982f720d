"""IntervalQuery — ordered/unordered minimal intervals with
maxgaps/maxwidth and saturation scoring (reference:
``lucene/queries/.../intervals/IntervalQuery.java``,
``OrderedIntervalsSource.java``, ``IntervalScorer.java``)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark import BooleanQuery, IndexConfig, IntervalQuery
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.oracle import intervals_sql
from pim_lucene_spark.plans.boolean import search_boolean

DOCS = pd.DataFrame({
    "doc_id": range(8),
    "content": [
        "alpha beta",                       # adjacent ordered pair
        "alpha x y beta",                   # ordered, 2 gaps
        "beta alpha",                       # reversed order
        "alpha alpha beta",                 # shared-start minimality
        "alpha beta alpha beta",            # two minimal intervals
        "x y z",                            # no terms
        "beta x alpha y beta",              # both orders present
        "alpha x beta y alpha beta gamma",  # mixed + third term
    ],
})


@pytest.fixture(scope="module")
def iv_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("iv") / "idx")
    return build_index(spark, spark.createDataFrame(DOCS), d,
                       IndexConfig(2, 2, build_chunks=1),
                       content_col="content", id_col="doc_id")


def _run(spark, idx, queries, precision="float64"):
    batch = [(qid, BooleanQuery(must=[q])) for qid, q in queries]
    return (search_boolean(spark, idx, batch, k=100, precision=precision)
            .toPandas().sort_values(["qid", "doc_id"])
            .reset_index(drop=True))


def _oracle(docs, queries, k=100):
    con = duckdb.connect()
    con.register("docs_raw", docs.rename(columns={"content": "text"}))
    con.execute("CREATE VIEW documents AS SELECT doc_id, text FROM docs_raw")
    return (con.execute(intervals_sql(queries, k=k)).fetchdf()
            .sort_values(["qid", "doc_id"]).reset_index(drop=True))


def test_ordered_matches_and_scores(spark, iv_index):
    q = IntervalQuery("alpha beta")
    got = _run(spark, iv_index, [(0, q)])
    # ordered alpha..beta matches docs 0,1,3,4,6,7 (not 2, not 5)
    assert list(got.doc_id) == [0, 1, 3, 4, 6, 7]
    # doc0: one interval len2 → freq 1 → 1*(1-1/2) = 0.5
    s = dict(zip(got.doc_id, got.score))
    assert s[0] == pytest.approx(0.5)
    # doc1: len4 → freq 1/3 → score (1/3)/(4/3) = 0.25
    assert s[1] == pytest.approx(0.25)
    # doc3: ONLY [1,2] (minimality: [0,2] contains it) → 0.5
    assert s[3] == pytest.approx(0.5)
    # doc4: [0,1] and [2,3] → freq 2 → 2/3
    assert s[4] == pytest.approx(2 / 3)


def test_maxgaps_filters_intervals(spark, iv_index):
    got = _run(spark, iv_index, [(0, IntervalQuery("alpha beta",
                                                   max_gaps=0))])
    # doc1 (2 gaps) and doc6 (alpha@2..beta@4, 1 gap) drop
    assert list(got.doc_id) == [0, 3, 4, 7]
    got = _run(spark, iv_index, [(0, IntervalQuery("alpha beta",
                                                   max_gaps=1))])
    assert 1 not in set(got.doc_id)  # still 2 gaps
    got = _run(spark, iv_index, [(0, IntervalQuery("alpha beta",
                                                   max_gaps=2))])
    assert 1 in set(got.doc_id)


def test_maxwidth(spark, iv_index):
    got = _run(spark, iv_index, [(0, IntervalQuery("alpha beta",
                                                   max_width=2))])
    assert 1 not in set(got.doc_id)
    assert 0 in set(got.doc_id)


def test_unordered_within_n(spark, iv_index):
    # "alpha within 1 gap of beta, any order": doc2 (beta alpha) now in
    got = _run(spark, iv_index, [(0, IntervalQuery("alpha beta",
                                                   ordered=False,
                                                   max_gaps=0))])
    assert 2 in set(got.doc_id)
    assert 1 not in set(got.doc_id)
    # doc6 "beta x alpha y beta": minimal windows [0,2],[2,4] (len 3,
    # 1 gap each) → dropped at max_gaps=0
    assert 6 not in set(got.doc_id)


def test_three_term_ordered(spark, iv_index):
    got = _run(spark, iv_index, [(0, IntervalQuery("alpha beta gamma"))])
    assert list(got.doc_id) == [7]
    # doc7 minimal chain: beta=max<6(gamma)=5? positions: alpha@0,x@1,
    # beta@2,y@3,alpha@4,beta@5,gamma@6 → beta=5, alpha=4 → [4,6] len3
    # → freq 1/1? len-minext+1 = 3-3+1 = 1 → freq 1 → 0.5
    assert got.score.iloc[0] == pytest.approx(0.5)


def test_duckdb_differential_float64(spark, iv_index):
    queries = [
        (0, IntervalQuery("alpha beta")),
        (1, IntervalQuery("alpha beta", max_gaps=0)),
        (2, IntervalQuery("alpha beta", ordered=False)),
        (3, IntervalQuery("alpha beta", ordered=False, max_gaps=1)),
        (4, IntervalQuery("alpha beta gamma")),
        (5, IntervalQuery("beta alpha", max_width=3)),
        (6, IntervalQuery("alpha beta", pivot=2.5, boost=1.7)),
        (7, IntervalQuery("alpha")),          # single term: freq = tf
        (8, IntervalQuery("alpha missingterm")),  # absent term: empty
    ]
    got = _run(spark, iv_index, queries)
    ora = _oracle(DOCS, queries)
    assert list(got.qid) == list(ora.qid)
    assert list(got.doc_id) == list(ora.doc_id)
    np.testing.assert_allclose(got.score.to_numpy(),
                               ora.score.to_numpy(), rtol=0, atol=5e-7)


def test_float32_mode_runs_and_ranks_like_float64(spark, iv_index):
    q = [(0, IntervalQuery("alpha beta", max_gaps=3))]
    a = _run(spark, iv_index, q, precision="float32")
    b = _run(spark, iv_index, q, precision="float64")
    assert list(a.doc_id) == list(b.doc_id)
    np.testing.assert_allclose(a.score, b.score, rtol=1e-6)


def test_interval_inside_boolean_composition(spark, iv_index):
    # MUST term + SHOULD interval: scores add; FILTER interval gates
    bq = BooleanQuery(must=["alpha"],
                      should=[IntervalQuery("alpha beta", max_gaps=0)])
    got = (search_boolean(spark, iv_index, [(0, bq)], k=100,
                          precision="float64").toPandas())
    assert 2 in set(got.doc_id)  # matches must even without interval
    fq = BooleanQuery(must=["alpha"],
                      filter=[IntervalQuery("alpha beta", max_gaps=0)])
    got = (search_boolean(spark, iv_index, [(0, fq)], k=100,
                          precision="float64").toPandas())
    assert sorted(got.doc_id) == [0, 3, 4, 7]


def test_serving_parity(spark, iv_index):
    from pim_lucene_spark.serving import serve_local
    queries = [(0, IntervalQuery("alpha beta", max_gaps=0)),
               (1, IntervalQuery("alpha beta", ordered=False))]
    local = serve_local(iv_index, queries, 100, "float64", 0, None)
    dist = _run(spark, iv_index, queries)
    lp = (local.sort_values(["qid", "doc_id"]).reset_index(drop=True))
    assert list(lp.qid) == list(dist.qid)
    assert list(lp.doc_id) == list(dist.doc_id)
    np.testing.assert_array_equal(lp.score.to_numpy(),
                                  dist.score.to_numpy())


def test_count_and_query_facades(spark, iv_index):
    from pim_lucene_spark.index import FullTextIndex
    idx = FullTextIndex.open(spark, iv_index.index_dir)
    res = idx.query([(0, IntervalQuery("alpha beta", max_gaps=0))],
                    k=10).toPandas()
    assert sorted(res.doc_id) == [0, 3, 4, 7]
    from pim_lucene_spark.plans.suggest import count_matches
    n = count_matches(spark, iv_index,
                      [(0, IntervalQuery("alpha beta", max_gaps=0))])
    assert n.toPandas().set_index("qid").n_hits.to_dict() == {0: 4}


def test_explain_interval(spark, iv_index):
    from pim_lucene_spark.plans.explain import explain
    q = IntervalQuery("alpha beta", max_gaps=2, pivot=2.0, boost=1.5)
    got = _run(spark, iv_index, [(0, q)])
    s = dict(zip(got.doc_id, got.score))
    for d in range(8):
        ex = explain(iv_index, q, d, precision="float64")
        if d in s:
            assert ex["matches"] is True
            assert ex["score"] == pytest.approx(s[d], abs=1e-12)
        else:
            assert ex["matches"] is False and ex["score"] == 0.0
    # inside a boolean: explain's sum must equal the kernel score
    bq = BooleanQuery(must=["alpha"], should=[q])
    kern = (search_boolean(spark, iv_index, [(0, bq)], k=100,
                           precision="float64").toPandas())
    for r in kern.itertuples(index=False):
        ex = explain(iv_index, bq, int(r.doc_id), precision="float64")
        assert ex["score"] == pytest.approx(float(r.score), abs=1e-12)


def test_or_sources_ordered(spark, iv_index):
    # "alpha near (beta OR gamma)" — doc7 has both beta and gamma ends
    q = IntervalQuery(sources=("alpha", ("beta", "gamma")))
    got = _run(spark, iv_index, [(0, q)])
    assert set(got.doc_id) == {0, 1, 3, 4, 6, 7}
    # doc7: alpha@0/x@1/beta@2/y@3/alpha@4/beta@5/gamma@6 → slot2 union
    # {2,5,6}: FB ends: 2→a=0 [0,2]; 5→a=4 [4,5]; 6→a=4 dedup(start 4
    # keeps min end 5) → intervals [0,2],[4,5] → freq 1/2 + 1 = 1.5
    s = dict(zip(got.doc_id, got.score))
    assert s[7] == pytest.approx(1.5 / 2.5)
    # plain text form and single-alt sources agree everywhere
    q2 = IntervalQuery(sources=("alpha", "beta"))
    a = _run(spark, iv_index, [(0, IntervalQuery("alpha beta"))])
    b = _run(spark, iv_index, [(0, q2)])
    pd.testing.assert_frame_equal(a, b)


def test_or_sources_duckdb_differential(spark, iv_index):
    queries = [
        (0, IntervalQuery(sources=("alpha", ("beta", "gamma")))),
        (1, IntervalQuery(sources=(("alpha", "x"), "beta"), max_gaps=0)),
        (2, IntervalQuery(sources=("alpha", ("beta", "gamma")),
                          ordered=False, max_gaps=1)),
        (3, IntervalQuery(sources=(("beta", "missing"), "alpha"))),
    ]
    got = _run(spark, iv_index, queries)
    ora = _oracle(DOCS, queries)
    assert list(got.qid) == list(ora.qid)
    assert list(got.doc_id) == list(ora.doc_id)
    np.testing.assert_allclose(got.score.to_numpy(),
                               ora.score.to_numpy(), rtol=0, atol=5e-7)


def test_or_sources_serving_and_explain(spark, iv_index):
    from pim_lucene_spark.plans.explain import explain
    from pim_lucene_spark.serving import serve_local
    q = IntervalQuery(sources=("alpha", ("beta", "gamma")), max_gaps=2)
    dist = _run(spark, iv_index, [(0, q)])
    loc = (serve_local(iv_index, [(0, q)], 100, "float64", 0, None)
           .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    assert list(loc.doc_id) == list(dist.doc_id)
    np.testing.assert_array_equal(loc.score.to_numpy(),
                                  dist.score.to_numpy())
    s = dict(zip(dist.doc_id, dist.score))
    for d in range(8):
        ex = explain(iv_index, q, d, precision="float64")
        assert ex["matches"] == (d in s)
        if d in s:
            assert ex["score"] == pytest.approx(s[d], abs=1e-12)


def test_interval_query_validation():
    with pytest.raises(ValueError, match="exactly one"):
        IntervalQuery()
    with pytest.raises(ValueError, match="exactly one"):
        IntervalQuery("a b", sources=("a",))
    with pytest.raises(ValueError, match="non-empty"):
        IntervalQuery(sources=("a", ()))


def test_or_alternative_in_masked_out_segments(spark, tmp_path_factory):
    """/code-review r6 pass 2: an OR alternative whose postings all live
    in segments the co-presence mask excludes must decode empty, not
    crash (rd[jc] on an empty rel_docs array raised IndexError)."""
    from pim_lucene_spark.operators.index_build import build_index
    # 1 partition, 2 segments; 'b' only in the late segment, 'a'/'c'
    # only in the early one → pres (slot {a,b} AND slot {c}) masks the
    # segment holding 'b'
    docs = pd.DataFrame({
        "doc_id": range(6),
        "content": ["a x c", "a y c", "a z c",
                    "b q r", "b s t", "b u v"],
    })
    d = str(tmp_path_factory.mktemp("ivseg") / "idx")
    m = build_index(spark, spark.createDataFrame(docs),
                    d, IndexConfig(1, 2, build_chunks=1),
                    content_col="content", id_col="doc_id")
    q = IntervalQuery(sources=(("a", "b"), "c"), max_gaps=1)
    got = _run(spark, m, [(0, q)])
    assert sorted(got.doc_id) == [0, 1, 2]
    ora = _oracle(docs, [(0, q)])
    assert list(got.doc_id) == list(ora.doc_id)
    np.testing.assert_allclose(got.score.to_numpy(),
                               ora.score.to_numpy(), rtol=0, atol=5e-7)


def test_multi_token_or_alternative_raises_everywhere():
    """Engine, oracle and explain agree: a multi-token interval source
    is a ValueError, never a silent flatten."""
    from pim_lucene_spark.oracle import intervals_sql
    q = IntervalQuery(sources=(("fast merge",), "scan"))
    with pytest.raises(ValueError, match="exactly one term"):
        intervals_sql([(0, q)])
