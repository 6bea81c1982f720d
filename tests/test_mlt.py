"""MoreLikeThis (plans/mlt.py): interesting-term selection gates vs a
scalar reference, and the full query vs the DuckDB oracle's in-SQL term
selection + ordered list_reduce score fold."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.oracle import mlt_bm25_sql
from pim_lucene_spark.plans.mlt import interesting_terms, more_like_this

VOCAB = ["spark", "query", "merge", "table", "index", "batch", "row",
         "the", "of", "rare1", "rare2"]


def _corpus(n=120, seed=47):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        words = list(rng.choice(VOCAB[:9], size=rng.integers(6, 20)))
        if i < 3:
            words += ["rare1", "rare1", "rare2"]  # low-df terms
        rows.append(" ".join(words))
    return pd.DataFrame({"doc_id": range(n), "content": rows})


@pytest.fixture(scope="module")
def midx(spark, tmp_path_factory):
    pdf = _corpus()
    cfg = IndexConfig(num_partitions=4, num_segments=2, build_chunks=1)
    m = build_index(spark, spark.createDataFrame(pdf),
                    str(tmp_path_factory.mktemp("mlt")), cfg,
                    content_col="content", id_col="doc_id")
    return m, pdf


def test_interesting_terms_gates_and_ranking(spark, midx):
    m, pdf = midx
    text = pdf.content[0]
    sel = interesting_terms(m, {0: text}, max_query_terms=5,
                            min_term_freq=2, min_doc_freq=5)[0]
    toks = text.split()
    n = m.doc_count
    dfs = {t: int(pdf.content.str.split().map(lambda ts: t in ts).sum())
           for t in set(toks)}
    exp = []
    for t in set(toks):
        tf = toks.count(t)
        if tf < 2 or dfs[t] < 5:
            continue
        exp.append((t, tf * (math.log((n + 1) / (dfs[t] + 1)) + 1.0)))
    exp.sort(key=lambda r: (-r[1], r[0]))
    assert sel == exp[:5]
    # rare1 appears twice in doc 0..2 but df=3 < 5: gated out
    sel_all = interesting_terms(m, {0: text}, max_query_terms=100,
                                min_term_freq=2, min_doc_freq=5)[0]
    assert "rare1" not in {t for t, _ in sel_all}
    # lowering the df gate lets it through, and it ranks FIRST (rarest)
    sel_lo = interesting_terms(m, {1: pdf.content[1]}, min_doc_freq=1,
                               max_query_terms=100)[1]
    if "rare1" in {t for t, _ in sel_lo}:
        assert sel_lo[0][0] == "rare1"


def test_mlt_matches_duckdb_oracle(spark, midx):
    m, pdf = midx
    queries = [(0, 0), (1, 17), (2, 63)]
    got = (more_like_this(spark, m, queries, k=10, precision="float64")
           .toPandas())
    got["score"] = got["score"].round(6)
    got = got.sort_values(["qid", "doc_id"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pdf.rename(columns={"content": "text"}))
    exp = (con.execute(mlt_bm25_sql(queries, k=10)).fetchdf()
           .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()), exp)


def test_mlt_source_doc_ranks_first(spark, midx):
    m, _ = midx
    got = (more_like_this(spark, m, [(0, 42)], k=3).toPandas()
           .sort_values("score", ascending=False))
    assert int(got.doc_id.iloc[0]) == 42


def test_mlt_boost_mode_scales_clauses(spark, midx):
    """boost=True must change scores (clause weights scale by
    score/bestScore) but keep the same match set."""
    m, _ = midx
    a = (more_like_this(spark, m, [(0, 5)], k=1000,
                        precision="float64").toPandas())
    b = (more_like_this(spark, m, [(0, 5)], k=1000, boost=True,
                        precision="float64").toPandas())
    assert set(a.doc_id) == set(b.doc_id)
    assert not np.allclose(
        a.sort_values("doc_id").score.to_numpy(),
        b.sort_values("doc_id").score.to_numpy())


def test_mlt_unknown_doc_raises(spark, midx):
    m, _ = midx
    with pytest.raises(KeyError, match="not in the index"):
        more_like_this(spark, m, [(0, 10 ** 9)])


def test_mlt_no_surviving_terms_empty(spark, midx):
    """Impossible gates select nothing: empty result, stable schema."""
    m, _ = midx
    out = more_like_this(spark, m, [(0, 0)], min_term_freq=10 ** 6)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields][:3] == \
        ["qid", "doc_id", "score"]
