"""Round-5 regression tests for the advisor findings:

- MultiFieldIndex.delete_docs must materialize a one-shot iterable once
  (every field sees the same ids; no silently-empty delete generations).
- count_matches must not route non-kernelable compound queries into the
  count kernel (sloppy clauses fall back to the join plan + count).
- hybrid_search must exclude EVERY query pseudo-vector from the dense
  candidates, not just each query's own id; ann="lsh" is a first-class
  scale path with auto selection by corpus size.
- search_boolean/search_dismax honor the documented k=None contract on
  the join plan.
"""

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark import IndexConfig, MultiFieldIndex
from pim_lucene_spark.operators.index_build import build_index


def test_multifield_delete_docs_accepts_generator(spark, tmp_path):
    docs = pd.DataFrame({
        "doc_id": range(6),
        "title": ["red apple", "green pear", "red plum",
                  "blue sky", "red sun", "pink dawn"],
        "body": ["apple pie now", "pear tart", "plum jam",
                 "sky high", "sun down", "dawn light"],
    })
    idx = MultiFieldIndex.build(
        spark, spark.createDataFrame(docs), str(tmp_path / "mfdel"),
        fields={"title": "title", "body": "body"},
        cfg=IndexConfig(num_partitions=2, num_segments=1, build_chunks=1),
        id_col="doc_id")
    # one-shot generator: pre-fix, field 2 saw an exhausted iterable and
    # wrote an empty generation (deleted docs kept matching body queries)
    idx.delete_docs(d for d in (0, 2))
    for name in idx.fields:
        assert idx.manifests[name].deleted_count == 2, name
    assert idx.search_term("red", field="title").toPandas() \
              .doc_id.tolist() == [4]
    body = idx.search_term("plum", field="body")
    assert body.count() == 0


def test_count_matches_boolean_sloppy_clause_joins(spark, tmp_path):
    """A boolean containing a sloppy-phrase clause is not kernelable —
    count_matches must fall back to the join plan instead of launching
    the count kernel (which raises NotImplementedError in executors)."""
    from pim_lucene_spark.plans.boolean import BooleanQuery, search_boolean
    from pim_lucene_spark.plans.query import PhraseQuery
    from pim_lucene_spark.plans.suggest import count_matches

    docs = pd.DataFrame({
        "doc_id": range(5),
        "content": ["red apple pie", "red tart pie", "red pie",
                    "green pie", "red apple"],
    })
    m = build_index(spark, spark.createDataFrame(docs),
                    str(tmp_path / "cntslop"),
                    IndexConfig(2, 1, build_chunks=1),
                    content_col="content", id_col="doc_id")
    bq = BooleanQuery(must=[PhraseQuery("red pie", slop=1)],
                      should=["apple"])
    plain = BooleanQuery(must=["red"], should=["pie"])
    got = (count_matches(spark, m, [(0, bq), (1, plain)])
           .toPandas().set_index("qid").n_hits)
    assert got[0] == search_boolean(spark, m, [(0, bq)], k=10 ** 6).count()
    assert got[1] == search_boolean(spark, m, [(1, plain)],
                                    k=10 ** 6).count()
    assert got[0] == 3  # docs 0,1,2: "red ? pie" within one position gap


def test_boolean_and_dismax_join_k_none(spark, tmp_path):
    """k=None on the join plan returns the full clause-evaluation frame
    (the documented contract; pre-fix it was a TypeError)."""
    from pim_lucene_spark.plans.boolean import BooleanQuery, search_boolean
    from pim_lucene_spark.plans.dismax import DisMaxQuery, search_dismax

    rng = np.random.default_rng(5)
    vocab = ["red", "green", "blue", "apple", "sky"]
    docs = pd.DataFrame({
        "doc_id": range(40),
        "content": [" ".join(rng.choice(vocab, size=6)) for _ in range(40)],
    })
    m = build_index(spark, spark.createDataFrame(docs),
                    str(tmp_path / "knone"),
                    IndexConfig(2, 1, build_chunks=1),
                    content_col="content", id_col="doc_id")
    bq = [(0, BooleanQuery(must=["red"], should=["apple"]))]
    dq = [(0, DisMaxQuery(clauses=["red", "apple"], tie=0.3))]
    for fn, batch in ((search_boolean, bq), (search_dismax, dq)):
        full = fn(spark, m, batch, k=10 ** 9, plan="join").toPandas()
        none = fn(spark, m, batch, k=None, plan="join").toPandas()
        a = full.sort_values(["qid", "doc_id"]).reset_index(drop=True)
        b = none.sort_values(["qid", "doc_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_multifield_delete_docs_accepts_dataframe(spark, tmp_path):
    """A Spark DataFrame of ids must pass through untouched (list(df)
    iterates __getitem__ and yields Column objects — review finding)."""
    docs = pd.DataFrame({
        "doc_id": range(4),
        "title": ["red a", "green b", "red c", "blue d"],
        "body": ["aa xx", "bb yy", "cc zz", "dd ww"],
    })
    idx = MultiFieldIndex.build(
        spark, spark.createDataFrame(docs), str(tmp_path / "mfdf"),
        fields={"title": "title", "body": "body"},
        cfg=IndexConfig(num_partitions=2, num_segments=1, build_chunks=1),
        id_col="doc_id")
    ids = spark.createDataFrame([(0,), (2,)], "doc_id long")
    assert idx.delete_docs(ids) == 2
    for name in idx.fields:
        assert idx.manifests[name].deleted_count == 2, name
    assert idx.search_term("red", field="title").count() == 0


def test_constant_score_exotic_inner(spark, tmp_path):
    """ConstantScoreQuery wraps ANY query: DisMax and nested
    ConstantScore inners take the recursive path (review finding: the
    boolean rewrite only hosts clause-form inners)."""
    from pim_lucene_spark.index import FullTextIndex
    from pim_lucene_spark.plans.dismax import DisMaxQuery
    from pim_lucene_spark.plans.query import (ConstantScoreQuery,
                                              PhraseQuery)

    docs = pd.DataFrame({
        "doc_id": range(6),
        "content": ["red apple", "green pear", "red plum",
                    "apple tart", "red sun", "pear pie"],
    })
    m = build_index(spark, spark.createDataFrame(docs),
                    str(tmp_path / "csq"), IndexConfig(2, 1, build_chunks=1),
                    content_col="content", id_col="doc_id")
    idx = FullTextIndex(spark, m)
    res = idx.query([
        (0, ConstantScoreQuery(DisMaxQuery(clauses=["red", "apple"]),
                               boost=2.0)),
        (1, ConstantScoreQuery(
            ConstantScoreQuery(PhraseQuery("red apple"), boost=9.0),
            boost=0.5)),
    ], k=10, precision="float64").toPandas()
    q0 = res[res.qid == 0]
    assert sorted(q0.doc_id) == [0, 2, 3, 4]  # red ∪ apple
    assert (q0.score == 2.0).all()
    q1 = res[res.qid == 1]
    assert sorted(q1.doc_id) == [0]
    assert (q1.score == 0.5).all()  # outer boost wins


# ---------------------------------------------------------------- hybrid

def _clustered_emb(n=240, dim=16, seed=11, clusters=24):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((clusters, dim))
    m = (centers[np.arange(n) % clusters]
         + 0.25 * rng.standard_normal((n, dim))).astype(np.float32)
    return pd.DataFrame({"vec_id": range(n),
                         "embedding": [list(map(float, r)) for r in m]})


@pytest.fixture(scope="module")
def hybrid_setup(spark, tmp_path_factory):
    rng = np.random.default_rng(7)
    vocab = ["spark", "merge", "scan", "row", "fast", "data", "join"]
    n = 240
    docs = pd.DataFrame({
        "doc_id": range(n),
        "content": [" ".join(rng.choice(vocab, size=8)) for _ in range(n)],
    })
    m = build_index(spark, spark.createDataFrame(docs),
                    str(tmp_path_factory.mktemp("hybidx")),
                    IndexConfig(2, 1, build_chunks=1),
                    content_col="content", id_col="doc_id")
    emb = _clustered_emb(n)
    # query pseudo-vectors live at ids >= n; make q 300 and 301 identical
    # so each would rank #1 in the other's dense list if not excluded
    qv = emb.iloc[3].embedding
    extra = pd.DataFrame({"vec_id": [300, 301],
                          "embedding": [list(qv), list(qv)]})
    emb_all = spark.createDataFrame(pd.concat([emb, extra],
                                              ignore_index=True))
    return m, emb_all


def test_hybrid_excludes_all_query_vectors(spark, hybrid_setup):
    from pim_lucene_spark.operators.fusion import hybrid_search
    m, emb = hybrid_setup
    got = hybrid_search(spark, m, emb,
                        [(0, "spark merge", 300), (1, "fast data", 301)],
                        k=10, n_candidates=15, ann="bruteforce").toPandas()
    assert not set(got.doc_id) & {300, 301}
    assert set(got.qid) == {0, 1}


def test_hybrid_lsh_path_and_auto(spark, hybrid_setup):
    """ann='lsh' fuses through the bucketed dense path with recall@10
    >= 0.9 vs the brute-force fusion; ann='auto' picks by corpus size."""
    from pim_lucene_spark.operators.fusion import hybrid_search
    m, emb = hybrid_setup
    batch = [(0, "spark merge", 300), (1, "fast data", 301)]
    kw = dict(k=10, n_candidates=15, num_planes=6, num_tables=8, dim=16)
    exact = hybrid_search(spark, m, emb, batch, ann="bruteforce",
                          **kw).toPandas()
    lsh = hybrid_search(spark, m, emb, batch, ann="lsh", **kw).toPandas()
    assert not set(lsh.doc_id) & {300, 301}
    ex = exact.groupby("qid").doc_id.apply(set).to_dict()
    ap = lsh.groupby("qid").doc_id.apply(set).to_dict()
    hits = sum(len(ex[q] & ap.get(q, set())) for q in ex)
    assert hits / sum(len(v) for v in ex.values()) >= 0.9
    # auto: below threshold == bruteforce result, above == lsh result
    auto_bf = hybrid_search(spark, m, emb, batch, ann="auto",
                            lsh_threshold=10 ** 6, **kw).toPandas()
    pd.testing.assert_frame_equal(
        auto_bf.sort_values(["qid", "doc_id"]).reset_index(drop=True),
        exact.sort_values(["qid", "doc_id"]).reset_index(drop=True))
    auto_lsh = hybrid_search(spark, m, emb, batch, ann="auto",
                             lsh_threshold=0, **kw).toPandas()
    pd.testing.assert_frame_equal(
        auto_lsh.sort_values(["qid", "doc_id"]).reset_index(drop=True),
        lsh.sort_values(["qid", "doc_id"]).reset_index(drop=True))
