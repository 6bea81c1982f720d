"""IndexSearcher.explain parity: the factor tree's score must be
bit-identical (float32) to what search() gives the same doc.
"""

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.operators.search import search
from pim_lucene_spark.plans.explain import explain

DOCS = pd.DataFrame({
    "doc_id": range(5),
    "content": ["red apple pie", "red brick house", "green apple tart",
                "red apple red apple", "bold ideas only"],
})


@pytest.fixture(scope="module")
def eidx(spark, tmp_path_factory):
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1)
    return build_index(spark, spark.createDataFrame(DOCS),
                       str(tmp_path_factory.mktemp("explidx")), cfg,
                       content_col="content", id_col="doc_id")


@pytest.mark.parametrize("text", ["red", "red apple", "apple"])
def test_explain_score_matches_search(spark, eidx, text):
    res = search(spark, eidx, [(0, text)], k=100).toPandas()
    assert len(res)
    for _, row in res.iterrows():
        ex = explain(eidx, text, int(row.doc_id))
        assert ex["matches"]
        assert np.float32(ex["score"]) == np.float32(row.score), \
            (text, row.doc_id)
        assert ex["freq"] == row.freq
        assert ex["norm_byte"] == row.norm


def test_explain_boost_and_factors(spark, eidx):
    from pim_lucene_spark.plans.query import TermQuery
    plain = explain(eidx, "red", 0)
    boosted = explain(eidx, TermQuery("red", boost=2.0), 0)
    assert np.float32(boosted["weight"]) == np.float32(
        np.float32(2.0) * np.float32(plain["weight"]))
    assert plain["per_term"][0]["doc_freq"] == 3
    assert plain["per_term"][0]["doc_count"] == 5
    assert plain["quantized_doc_length"] == 3


def test_explain_non_match_and_errors(spark, eidx):
    ex = explain(eidx, "red apple", 1)  # has red, no adjacent apple
    assert not ex["matches"] and ex["score"] == 0.0
    with pytest.raises(ValueError, match="not in the index"):
        explain(eidx, "red", 999)
    with pytest.raises(ValueError, match="slop"):
        from pim_lucene_spark.plans.query import PhraseQuery
        explain(eidx, PhraseQuery("red apple", slop=1), 0)


def test_explain_boolean_and_dismax_bit_identity(spark, tmp_path):
    """Compound explain scores are bit-identical to the search plans for
    every returned doc; gates (must_not, msm) explain non-matches."""
    import numpy as np
    import pandas as pd

    from pim_lucene_spark.config import IndexConfig
    from pim_lucene_spark.operators.index_build import build_index
    from pim_lucene_spark.plans.boolean import BooleanQuery, search_boolean
    from pim_lucene_spark.plans.dismax import DisMaxQuery, search_dismax
    from pim_lucene_spark.plans.explain import explain

    rng = np.random.default_rng(21)
    vocab = ["red", "green", "blue", "apple", "sky", "pie", "the"]
    docs = pd.DataFrame({
        "doc_id": range(50),
        "content": [" ".join(rng.choice(vocab, size=rng.integers(4, 12)))
                    for _ in range(50)],
    })
    m = build_index(spark, spark.createDataFrame(docs),
                    str(tmp_path / "exidx"),
                    IndexConfig(2, 2, build_chunks=1),
                    content_col="content", id_col="doc_id")

    bq = BooleanQuery(must=["red"], should=["apple", "the sky"],
                      must_not=["pie"], boost=2.0, min_should_match=1)
    got = search_boolean(spark, m, [(0, bq)], k=50).toPandas()
    assert len(got)
    for d, s in zip(got.doc_id, got.score):
        ex = explain(m, bq, int(d))
        assert ex["matches"] and np.float32(ex["score"]) == np.float32(s)
    # a doc excluded by must_not explains as non-matching
    pie_docs = docs[docs.content.str.contains("pie")
                    & docs.content.str.contains("red")]
    if len(pie_docs):
        ex = explain(m, bq, int(pie_docs.doc_id.iloc[0]))
        assert not ex["matches"] and ex["score"] == 0.0

    dq = DisMaxQuery(clauses=["red", "the sky"], tie=0.3, boost=1.5)
    got = search_dismax(spark, m, [(0, dq)], k=50).toPandas()
    assert len(got)
    for d, s in zip(got.doc_id, got.score):
        ex = explain(m, dq, int(d))
        assert ex["matches"] and np.float32(ex["score"]) == np.float32(s)


def test_explain_matchall_and_constant_score(spark, eidx):
    """MatchAllDocs / ConstantScore explains: constant score == boost,
    wrapper matches iff the inner matches; *:*-in-boolean composes."""
    from pim_lucene_spark.plans.boolean import BooleanQuery
    from pim_lucene_spark.plans.query import (ConstantScoreQuery,
                                              MatchAllDocsQuery,
                                              PhraseQuery)

    m = eidx
    e = explain(m, MatchAllDocsQuery(boost=2.5), 0)
    assert e["matches"] and e["score"] == 2.5
    hit = explain(m, ConstantScoreQuery(PhraseQuery("red apple"),
                                        boost=3.0), 0)
    assert hit["matches"] and hit["score"] == 3.0    # doc 0: red apple pie
    assert "inner" in hit
    miss = explain(m, ConstantScoreQuery(PhraseQuery("red apple"),
                                         boost=3.0), 4)
    assert not miss["matches"] and miss["score"] == 0.0
    # *:* as a boolean clause: constant contribution sums with BM25
    bq = BooleanQuery(must=["red"], should=[MatchAllDocsQuery(boost=0.5)])
    from pim_lucene_spark.plans.boolean import search_boolean
    res = search_boolean(spark, m, [(0, bq)], k=50,
                         precision="float32").toPandas()
    for _, row in res.head(3).iterrows():
        eb = explain(m, bq, int(row.doc_id))
        assert eb["matches"]
        assert abs(eb["score"] - row.score) < 1e-6, (row.doc_id,)
