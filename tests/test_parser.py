"""Classic query-string parser — Lucene QueryParser grammar subset →
typed queries, plus end-to-end facade routing.
"""

import pandas as pd
import pytest

from pim_lucene_spark.plans.boolean import BooleanQuery
from pim_lucene_spark.plans.multiterm import (FuzzyQuery, PrefixQuery,
                                              RegexpQuery, TermRangeQuery,
                                              WildcardQuery)
from pim_lucene_spark.plans.parser import parse_query
from pim_lucene_spark.plans.query import PhraseQuery, TermQuery


# --- single clauses ---------------------------------------------------------

def test_bare_term():
    assert parse_query("foo") == TermQuery("foo")


def test_phrase_and_slop():
    assert parse_query('"red apple"') == PhraseQuery("red apple")
    assert parse_query('"red apple"~3') == PhraseQuery("red apple", slop=3)


def test_fuzzy_default_and_explicit():
    assert parse_query("merge~") == FuzzyQuery("merge", max_edits=2)
    assert parse_query("merge~1") == FuzzyQuery("merge", max_edits=1)


def test_prefix_vs_wildcard():
    assert parse_query("fo*") == PrefixQuery("fo")
    assert parse_query("f*o?") == WildcardQuery("f*o?")
    assert parse_query("*oo") == WildcardQuery("*oo")


def test_escaped_star_is_a_term():
    assert parse_query(r"fo\*") == TermQuery("fo*")


def test_regexp():
    assert parse_query("/ab.c/") == RegexpQuery("ab.c")


def test_ranges():
    assert parse_query("[aa TO bb]") == TermRangeQuery(
        "aa", "bb", include_lower=True, include_upper=True)
    assert parse_query("{aa TO bb}") == TermRangeQuery(
        "aa", "bb", include_lower=False, include_upper=False)
    assert parse_query("[* TO bb]") == TermRangeQuery(
        None, "bb", include_lower=True, include_upper=True)


def test_boost_applies():
    assert parse_query("foo^2.5") == TermQuery("foo", boost=2.5)
    assert parse_query('"a b"^2') == PhraseQuery("a b", boost=2.0)
    assert parse_query("pre*^3") == PrefixQuery("pre", boost=3.0)


# --- boolean composition ----------------------------------------------------

def test_plus_minus_bare():
    q = parse_query('+alpha -beta gamma "d e"')
    assert q == BooleanQuery(must=[TermQuery("alpha")],
                             must_not=[TermQuery("beta")],
                             should=[TermQuery("gamma"),
                                     PhraseQuery("d e")])


def test_and_promotes_both_sides():
    q = parse_query("a AND b c")
    assert q == BooleanQuery(must=[TermQuery("a"), TermQuery("b")],
                             should=[TermQuery("c")])


def test_or_keeps_should():
    q = parse_query("a OR b")
    assert q == BooleanQuery(should=[TermQuery("a"), TermQuery("b")])


def test_not_keyword():
    q = parse_query("a NOT b")
    assert q == BooleanQuery(should=[TermQuery("a")],
                             must_not=[TermQuery("b")])


def test_default_operator_and():
    q = parse_query("a b", default_operator="and")
    assert q == BooleanQuery(must=[TermQuery("a"), TermQuery("b")])


def test_or_demotes_under_and_default():
    # QueryParserBase.java:377-385: under AND_OPERATOR, OR retroactively
    # demotes the preceding non-prohibited clause to SHOULD
    q = parse_query("a OR b", default_operator="and")
    assert q == BooleanQuery(should=[TermQuery("a"), TermQuery("b")])
    # '+a OR b' → 'a OR b' (the reference's own comment: explicit + is
    # demoted too; only prohibited clauses survive)
    q = parse_query("+a OR b", default_operator="and")
    assert q == BooleanQuery(should=[TermQuery("a"), TermQuery("b")])
    # '-a OR b' keeps the prohibition
    q = parse_query("-a OR b", default_operator="and")
    assert q == BooleanQuery(must_not=[TermQuery("a")],
                             should=[TermQuery("b")])
    # under the OR default nothing is demoted (no operator==AND branch)
    q = parse_query("+a OR b", default_operator="or")
    assert q == BooleanQuery(must=[TermQuery("a")],
                             should=[TermQuery("b")])
    # mixed chain: 'a AND b OR c' under AND → +a b c? No: AND promotes a,
    # then OR demotes b; c takes the OR conj → should
    q = parse_query("a AND b OR c", default_operator="and")
    assert q == BooleanQuery(must=[TermQuery("a")],
                             should=[TermQuery("b"), TermQuery("c")])


def test_boosted_clause_in_boolean():
    q = parse_query("+a^2 b")
    assert q == BooleanQuery(must=[TermQuery("a", boost=2.0)],
                             should=[TermQuery("b")])


# --- rejected constructs (clear errors) -------------------------------------

def test_rejects_groups_fields_mixed_multiterm():
    with pytest.raises(ValueError, match="single-field"):
        parse_query("title:foo")
    with pytest.raises(ValueError, match="dangling"):
        parse_query("a AND")
    with pytest.raises(ValueError, match="empty"):
        parse_query("   ")


# --- end-to-end through the facade ------------------------------------------

def test_parse_and_query_end_to_end(spark, tmp_path_factory):
    from pim_lucene_spark import FullTextIndex, IndexConfig
    from pim_lucene_spark.operators.index_build import build_index

    docs = pd.DataFrame({
        "doc_id": range(5),
        "content": ["red apple pie", "red brick house", "green apple tart",
                    "red apple red apple", "bold ideas only"],
    })
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1)
    m = build_index(spark, spark.createDataFrame(docs),
                    str(tmp_path_factory.mktemp("parseidx")), cfg,
                    content_col="content", id_col="doc_id")
    idx = FullTextIndex(spark, m)
    res = idx.parse_and_query([
        (0, '"red apple"'),
        (1, "+red -green apple"),
        (2, "bo*"),
        (3, "bold~1"),
    ], k=10).toPandas()
    by_q = {q: set(g.doc_id) for q, g in res.groupby("qid")}
    assert by_q[0] == {0, 3}
    assert by_q[1] == {0, 1, 3}          # red docs, minus green, apple adds
    assert by_q[2] == {4}                # bold
    assert 4 in by_q[3]


# --- field: bindings (MultiFieldIndex mode) ---------------------------------

def test_fields_rejected_by_default():
    with pytest.raises(ValueError, match="single-field"):
        parse_query("title:foo")


def test_fielded_parse():
    from pim_lucene_spark.plans.query import FieldedQuery
    q = parse_query("title:foo", allow_fields=True)
    assert q == FieldedQuery("title", TermQuery("foo"))
    q = parse_query('+title:"a b" -body:tmp* c', allow_fields=True)
    assert q == BooleanQuery(
        must=[FieldedQuery("title", PhraseQuery("a b"))],
        must_not=[FieldedQuery("body", PrefixQuery("tmp"))],
        should=[TermQuery("c")])
    q = parse_query("title:foo^2", allow_fields=True)
    assert q == FieldedQuery("title", TermQuery("foo", boost=2.0))


def test_fielded_parse_errors():
    with pytest.raises(ValueError, match="chained"):
        parse_query("a:b:c", allow_fields=True)
    with pytest.raises(ValueError, match="dangling"):
        parse_query("title:", allow_fields=True)


def test_multifield_parse_and_query_end_to_end(spark, tmp_path_factory):
    import numpy as np

    from pim_lucene_spark import IndexConfig, MultiFieldIndex

    docs = pd.DataFrame({
        "doc_id": range(4),
        "title": ["alpha merge", "beta scan", "alpha scan", "gamma merge"],
        "body": ["x y z", "x merge z", "y z merge", "x y"],
    })
    idx = MultiFieldIndex.build(
        spark, spark.createDataFrame(docs),
        str(tmp_path_factory.mktemp("mfparse")),
        fields={"title": "title", "body": "body"},
        cfg=IndexConfig(num_partitions=2, num_segments=2, build_chunks=1),
        id_col="doc_id")
    res = idx.parse_and_query([
        (0, "title:merge"),                       # docs 0, 3
        (1, "+title:alpha body:merge"),           # 0,2; body:merge adds on 2
        (2, "+body:merge -title:beta"),           # body merge {1,2} - beta {1}
        (3, "title:al*"),                         # prefix on title
    ], k=10).toPandas()
    by_q = {q: set(g.doc_id) for q, g in res.groupby("qid")}
    assert by_q[0] == {0, 3}
    assert by_q[1] == {0, 2}
    assert by_q[2] == {2}
    assert by_q[3] == {0, 2}
    # cross-field scoring: qid 1 doc 2 = title:alpha BM25 + body:merge BM25
    t = idx.search([(0, "alpha")], field="title", k=10).toPandas()
    b = idx.search([(0, "merge")], field="body", k=10).toPandas()
    ts = dict(zip(t.doc_id, t.score))
    bs = dict(zip(b.doc_id, b.score))
    got = res[(res.qid == 1)].set_index("doc_id").score
    for d in (0, 2):
        exp = np.float32(np.float64(ts.get(d, 0.0)) + np.float64(bs.get(d, 0.0)))
        assert np.float32(got[d]) == exp


# --- MatchAllDocs / ConstantScore -------------------------------------------

def test_match_all_parse():
    from pim_lucene_spark.plans.query import MatchAllDocsQuery
    assert parse_query("*:*") == MatchAllDocsQuery()
    assert parse_query("*:*^2") == MatchAllDocsQuery(boost=2.0)


def test_match_all_and_constant_score_end_to_end(spark, tmp_path_factory):
    from pim_lucene_spark import (ConstantScoreQuery, FullTextIndex,
                                  IndexConfig, MatchAllDocsQuery)
    from pim_lucene_spark.operators.index_build import build_index

    docs = pd.DataFrame({
        "doc_id": range(5),
        "content": ["red apple pie", "red brick house", "green apple tart",
                    "red apple red apple", "bold ideas only"],
    })
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1)
    m = build_index(spark, spark.createDataFrame(docs),
                    str(tmp_path_factory.mktemp("maidx")), cfg,
                    content_col="content", id_col="doc_id")
    idx = FullTextIndex(spark, m)
    res = idx.query([
        (0, MatchAllDocsQuery(boost=3.0)),
        (1, ConstantScoreQuery(PhraseQuery("red apple"), boost=2.0)),
        (2, parse_query("*:*")),
    ], k=3).toPandas()
    by_q = {q: g for q, g in res.groupby("qid")}
    assert list(by_q[0].doc_id) == [0, 1, 2]       # k smallest ids
    assert (by_q[0].score == 3.0).all()
    assert set(by_q[1].doc_id) == {0, 3}           # phrase matches
    assert (by_q[1].score == 2.0).all()
    assert len(by_q[2]) == 3 and (by_q[2].score == 1.0).all()


# --- code-review regressions ------------------------------------------------

def test_and_promotes_through_modifier():
    """'a AND NOT b AND c' must require a AND c (classic QueryParser
    promotes the previous clause on every CONJ_AND, even when the next
    clause carries its own modifier)."""
    q = parse_query("a AND NOT b AND c")
    assert q == BooleanQuery(must=[TermQuery("a"), TermQuery("c")],
                             must_not=[TermQuery("b")])
    q = parse_query("a AND +b")
    assert q == BooleanQuery(must=[TermQuery("a"), TermQuery("b")])


def test_pure_negative_clear_error():
    with pytest.raises(ValueError, match="purely negative"):
        parse_query("-foo")
    with pytest.raises(ValueError, match="purely negative"):
        parse_query("-foo -bar")


def test_fractional_fuzzy_rejected():
    with pytest.raises(ValueError, match="Fractional edit distances"):
        parse_query("foo~0.8")
    assert parse_query("foo~2.0") == FuzzyQuery("foo", max_edits=2)


def test_match_all_with_negation_end_to_end(spark, tmp_path_factory):
    from pim_lucene_spark import FullTextIndex, IndexConfig
    from pim_lucene_spark.operators.index_build import build_index

    docs = pd.DataFrame({
        "doc_id": range(4),
        "content": ["red apple", "green tree", "red brick", "blue sky"],
    })
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1)
    m = build_index(spark, spark.createDataFrame(docs),
                    str(tmp_path_factory.mktemp("manidx")), cfg,
                    content_col="content", id_col="doc_id")
    idx = FullTextIndex(spark, m)
    res = idx.parse_and_query([(0, "*:* -red")], k=10).toPandas()
    assert set(res.doc_id) == {1, 3}
    assert (res.score == 1.0).all()


# --- parenthesized sub-groups -----------------------------------------------

def test_group_parse():
    q = parse_query("(a b) c")
    assert q == BooleanQuery(
        should=[BooleanQuery(should=[TermQuery("a"), TermQuery("b")]),
                TermQuery("c")])
    q = parse_query("+(a b) -c")
    assert q == BooleanQuery(
        must=[BooleanQuery(should=[TermQuery("a"), TermQuery("b")])],
        must_not=[TermQuery("c")])
    # boost on a group; single-clause group unwraps
    q = parse_query("(a AND b)^2 (c)")
    assert q == BooleanQuery(
        should=[BooleanQuery(must=[TermQuery("a"), TermQuery("b")],
                             boost=2.0),
                TermQuery("c")])
    # nesting depth 2
    q = parse_query("+((a b) d) e")
    inner = BooleanQuery(should=[TermQuery("a"), TermQuery("b")])
    assert q == BooleanQuery(
        must=[BooleanQuery(should=[inner, TermQuery("d")])],
        should=[TermQuery("e")])


def test_group_fielded_parse():
    from pim_lucene_spark.plans.query import FieldedQuery
    q = parse_query("title:(a b) c", allow_fields=True)
    assert q == BooleanQuery(
        should=[FieldedQuery("title",
                             BooleanQuery(should=[TermQuery("a"),
                                                  TermQuery("b")])),
                TermQuery("c")])


def test_group_errors():
    with pytest.raises(ValueError, match=r"unbalanced '\('"):
        parse_query("(a b")
    with pytest.raises(ValueError, match=r"unbalanced '\)'"):
        parse_query("a b)")
    with pytest.raises(ValueError, match="empty group"):
        parse_query("() a")
    with pytest.raises(ValueError, match="dangling"):
        parse_query("(a AND) b")


def test_group_end_to_end(spark, tmp_path_factory):
    import numpy as np

    from pim_lucene_spark import FullTextIndex, IndexConfig
    from pim_lucene_spark.operators.index_build import build_index

    docs = pd.DataFrame({
        "doc_id": range(5),
        "content": ["red apple pie", "red brick house", "green apple tart",
                    "red apple red apple", "bold ideas only"],
    })
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1)
    m = build_index(spark, spark.createDataFrame(docs),
                    str(tmp_path_factory.mktemp("grpidx")), cfg,
                    content_col="content", id_col="doc_id")
    idx = FullTextIndex(spark, m)
    # (pie OR tart) docs {0,2}; AND red -> {0}
    res = idx.parse_and_query([(0, "+(pie tart) +red")], k=10).toPandas()
    assert set(res.doc_id) == {0}
    # nested group score == pie-score + red-score on doc 0
    from pim_lucene_spark.operators.search import search
    pie = dict(zip(*[search(spark, m, [(0, "pie")], k=10).toPandas()
                     [c] for c in ("doc_id", "score")]))
    red = dict(zip(*[search(spark, m, [(0, "red")], k=10).toPandas()
                     [c] for c in ("doc_id", "score")]))
    exp = np.float32(np.float64(pie[0]) + np.float64(red[0]))
    assert np.float32(res.score.iloc[0]) == exp


def test_group_oracle(spark, tmp_path_factory):
    duckdb = pytest.importorskip("duckdb")
    from pim_lucene_spark import IndexConfig
    from pim_lucene_spark.operators.index_build import build_index
    from pim_lucene_spark.oracle import boolean_bm25_sql
    from pim_lucene_spark.plans.boolean import search_boolean

    docs = pd.DataFrame({
        "doc_id": range(5),
        "content": ["red apple pie", "red brick house", "green apple tart",
                    "red apple red apple", "bold ideas only"],
    })
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1)
    m = build_index(spark, spark.createDataFrame(docs),
                    str(tmp_path_factory.mktemp("grporcl")), cfg,
                    content_col="content", id_col="doc_id")
    specs = [
        (0, {"must": [{"should": ["pie", "tart"]}, "red"]}),
        (1, {"should": [{"must": ["red", "apple"], "boost": 2.0},
                        "bold"]}),
    ]
    bqs = [(qid, BooleanQuery(**{
        role: [BooleanQuery(**c) if isinstance(c, dict) else c
               for c in cls]
        for role, cls in spec.items() if role != "boost"}))
        for qid, spec in specs]
    got = (search_boolean(spark, m, bqs, k=10, precision="float64")
           .toPandas()
           .assign(score=lambda d: d.score.round(6))
           .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", docs.rename(columns={"content": "text"}))
    odf = (con.execute(boolean_bm25_sql(specs, k=10)).fetchdf()
           .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))
