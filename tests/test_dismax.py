"""DisjunctionMaxQuery — Lucene DisjunctionMaxScorer semantics
(max + tie * (sum - max)) over engine term/phrase clauses, plus the
DuckDB oracle mirror.
"""

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.operators.search import search
from pim_lucene_spark.plans.dismax import DisMaxQuery, search_dismax

DOCS = pd.DataFrame({
    "doc_id": range(6),
    "content": [
        "red apple pie",
        "red brick house",
        "green apple tart",
        "red apple red apple",
        "blue sky red sunset apple",
        "green grass only",
    ],
})


@pytest.fixture(scope="module")
def didx(spark, tmp_path_factory):
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1)
    return build_index(spark, spark.createDataFrame(DOCS),
                       str(tmp_path_factory.mktemp("dismax")), cfg,
                       content_col="content", id_col="doc_id")


def _scores(spark, didx, text, boost=1.0):
    r = search(spark, didx, [(0, text, boost)], k=100).toPandas()
    return dict(zip(r.doc_id, r.score))


def test_tie_zero_is_pure_max(spark, didx):
    got = search_dismax(spark, didx,
                        [(0, DisMaxQuery(clauses=["red", "apple"]))],
                        k=10).toPandas()
    red = _scores(spark, didx, "red")
    app = _scores(spark, didx, "apple")
    assert set(got.doc_id) == set(red) | set(app)  # union semantics
    for d, s in zip(got.doc_id, got.score):
        exp = np.float32(max(red.get(d, 0.0), app.get(d, 0.0)))
        assert np.float32(s) == exp


def test_tie_breaker_adds_fraction_of_rest(spark, didx):
    tie = 0.5
    got = search_dismax(
        spark, didx,
        [(0, DisMaxQuery(clauses=["red", "apple", "pie"], tie=tie))],
        k=10).toPandas()
    subs = [_scores(spark, didx, t) for t in ("red", "apple", "pie")]
    for d, s in zip(got.doc_id, got.score):
        vals = [sc.get(d, 0.0) for sc in subs]
        mx, total = max(vals), vals[0] + vals[1] + vals[2]
        assert np.float32(s) == np.float32(mx + tie * (total - mx))


def test_tie_one_equals_should_sum(spark, didx):
    """tie=1 degenerates to a pure-SHOULD boolean sum."""
    from pim_lucene_spark.plans.boolean import BooleanQuery, search_boolean
    dm = search_dismax(
        spark, didx,
        [(0, DisMaxQuery(clauses=["red", "apple"], tie=1.0))],
        k=10, precision="float64").toPandas().set_index("doc_id").score
    bq = search_boolean(
        spark, didx, [(0, BooleanQuery(should=["red", "apple"]))],
        k=10, precision="float64").toPandas().set_index("doc_id").score
    assert set(dm.index) == set(bq.index)
    for d in dm.index:
        assert dm[d] == pytest.approx(bq[d], abs=1e-12)


def test_boost_multiplies_at_top(spark, didx):
    plain = search_dismax(
        spark, didx,
        [(0, DisMaxQuery(clauses=["red", "apple"], tie=0.3))],
        k=10).toPandas().set_index("doc_id").score
    boosted = search_dismax(
        spark, didx,
        [(0, DisMaxQuery(clauses=["red", "apple"], tie=0.3, boost=2.0))],
        k=10).toPandas().set_index("doc_id").score
    for d in plain.index:
        assert np.float32(boosted[d]) == np.float32(
            np.float32(plain[d]) * np.float32(2.0))


def test_clause_boost_scales_that_clause(spark, didx):
    from pim_lucene_spark.plans.query import TermQuery
    got = search_dismax(
        spark, didx,
        [(0, DisMaxQuery(clauses=[TermQuery("red", boost=3.0), "apple"]))],
        k=10).toPandas()
    red3 = _scores(spark, didx, "red", boost=3.0)
    app = _scores(spark, didx, "apple")
    for d, s in zip(got.doc_id, got.score):
        assert np.float32(s) == np.float32(
            max(red3.get(d, 0.0), app.get(d, 0.0)))


def test_phrase_clause(spark, didx):
    got = search_dismax(
        spark, didx,
        [(0, DisMaxQuery(clauses=["red apple", "grass"]))],
        k=10).toPandas()
    ph = _scores(spark, didx, "red apple")
    gr = _scores(spark, didx, "grass")
    assert set(got.doc_id) == set(ph) | set(gr)


def test_batched_queries_one_search(spark, didx):
    got = search_dismax(
        spark, didx,
        [(0, DisMaxQuery(clauses=["red", "apple"])),
         (1, DisMaxQuery(clauses=["grass", "sky"], tie=0.4))],
        k=10).toPandas()
    assert set(got.qid) == {0, 1}
    assert set(got[got.qid == 1].doc_id) == {4, 5}


def test_dismax_matches_duckdb_oracle(spark, didx):
    duckdb = pytest.importorskip("duckdb")
    from pim_lucene_spark.oracle import dismax_bm25_sql
    specs = [
        (0, {"clauses": ["red", "apple"]}),
        (1, {"clauses": ["red apple", "green"], "tie": 0.25}),
        (2, {"clauses": [("red", 3.0), "apple", "pie"], "tie": 0.5,
             "boost": 2.0}),
    ]
    from pim_lucene_spark.plans.query import TermQuery

    def to_query(spec):
        clauses = [TermQuery(c[0], boost=c[1]) if isinstance(c, tuple)
                   else c for c in spec["clauses"]]
        return DisMaxQuery(clauses=clauses, tie=spec.get("tie", 0.0),
                           boost=spec.get("boost", 1.0))

    dqs = [(qid, to_query(spec)) for qid, spec in specs]
    got = (search_dismax(spark, didx, dqs, k=10, precision="float64")
           .toPandas()
           .assign(score=lambda d: d.score.round(6))
           .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", DOCS.rename(columns={"content": "text"}))
    odf = (con.execute(dismax_bm25_sql(specs, k=10)).fetchdf()
           .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_facade_mixed_typed_batch(spark, didx):
    from pim_lucene_spark import DisMaxQuery as DMQ
    from pim_lucene_spark import FullTextIndex, PhraseQuery
    idx = FullTextIndex(spark, didx)
    res = idx.query([
        (0, PhraseQuery("red apple")),
        (1, DMQ(clauses=["grass", "sky"], tie=0.4)),
    ], k=10).toPandas()
    assert set(res.qid) == {0, 1}
    assert res[res.qid == 1].freq.isna().all()  # dismax: no freq
    assert set(res[res.qid == 1].doc_id) == {4, 5}


def test_empty_clauses_raises():
    with pytest.raises(ValueError, match="at least one"):
        DisMaxQuery(clauses=[])


def test_bad_tie_raises():
    with pytest.raises(ValueError, match="tie"):
        DisMaxQuery(clauses=["x"], tie=1.5)
