"""Highlighting: best-fragment snippets for search hits."""

import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.operators.search import search
from pim_lucene_spark.plans.highlight import highlight

DOCS = pd.DataFrame({
    "doc_id": range(4),
    "content": [
        "the red apple fell from the old tree into the cold river below",
        "a red apple and another red apple on one red plate",
        "green apples only here",
        "short doc",
    ],
})


@pytest.fixture(scope="module")
def hidx(spark, tmp_path_factory):
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1)
    return build_index(spark, spark.createDataFrame(DOCS),
                       str(tmp_path_factory.mktemp("hlidx")), cfg,
                       content_col="content", id_col="doc_id")


def _docs_df(spark):
    return spark.createDataFrame(DOCS)


def test_phrase_snippet_wraps_match(spark, hidx):
    queries = [(0, "red apple")]
    hits = search(spark, hidx, queries, k=10)
    res = (highlight(_docs_df(spark), hits, queries, window=10)
           .toPandas().set_index("doc_id"))
    assert "<b>red apple</b>" in res.loc[0].snippet
    assert res.loc[0].n_matches == 1
    # doc 1 has two matches; both inside the window of the first
    assert res.loc[1].n_matches == 2
    assert res.loc[1].snippet.count("<b>red apple</b>") >= 1


def test_window_and_ellipses(spark, hidx):
    queries = [(0, "cold")]
    hits = search(spark, hidx, queries, k=10)
    res = highlight(_docs_df(spark), hits, queries, window=8).toPandas()
    snip = res.snippet.iloc[0]
    assert snip.startswith("...") and snip.endswith("...")
    assert "<b>cold</b>" in snip
    assert len(snip) < len(DOCS.content[0])


def test_custom_tags_and_no_match(spark, hidx):
    queries = [(0, "red apple")]
    hits = spark.createDataFrame([(0, 0), (0, 3)], "qid long, doc_id long")
    res = (highlight(_docs_df(spark), hits, queries,
                     pre="[", post="]").toPandas().set_index("doc_id"))
    assert "[red apple]" in res.loc[0].snippet
    assert res.loc[3].n_matches == 0 and res.loc[3].snippet is None


def test_standard_analyzer_best_effort(spark, tmp_path_factory):
    docs = pd.DataFrame({
        "doc_id": [0],
        "content": ["The Fast! brown Fox jumps"],
    })
    cfg = IndexConfig(num_partitions=1, num_segments=1, build_chunks=1,
                      tokenizer="standard")
    m = build_index(spark, spark.createDataFrame(docs),
                    str(tmp_path_factory.mktemp("hlstd")), cfg,
                    content_col="content", id_col="doc_id")
    queries = [(0, "the fast")]
    hits = search(spark, m, queries, k=10)
    res = highlight(spark.createDataFrame(docs), hits, queries,
                    tokenizer="standard").toPandas()
    assert res.n_matches.iloc[0] == 1
    assert "<b>The Fast</b>" in res.snippet.iloc[0]


def test_overlapping_matches_merge(spark):
    """Repeated-term phrases produce overlapping matches; the wrapped
    runs must merge instead of emitting mis-nested tags."""
    docs = pd.DataFrame({"doc_id": [0], "content": ["red red red end"]})
    hits = spark.createDataFrame([(0, 0)], "qid long, doc_id long")
    res = highlight(spark.createDataFrame(docs), hits,
                    [(0, "red red")], window=50).toPandas()
    snip = res.snippet.iloc[0]
    assert snip == "<b>red red red</b> end"
    assert res.n_matches.iloc[0] == 2
