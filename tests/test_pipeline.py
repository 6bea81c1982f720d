"""curate_corpus — the one-call training-data curation pipeline
(operators/pipeline.py): quality/language gates + exact and transitive
near-dup dedup with canonical selection."""

import pandas as pd
import pytest

from pim_lucene_spark.operators.pipeline import curate_corpus


@pytest.fixture()
def corpus(spark):
    rows = pd.DataFrame({
        "doc_id": range(8),
        "content": [
            "the fast table scan is a good plan for the data " * 5,  # 0 en
            "the fast table scan is a good plan for the data " * 5,  # 1 dup
            "el la de que y en un es " * 8,                          # 2 es
            "short",                                                 # 3 tiny
            "the quick brown fox jumps over the lazy dog " * 6,      # 4 en
            "!!! ??? ### $$$ %%% " * 30,                             # 5 junk
            "the miner works in the deep dark mine all day " * 6,    # 6 en
            "the miner toils in the deep dark mine all day " * 6,    # 7 ~dup
        ],
    })
    return spark.createDataFrame(rows)


def test_gates_and_exact_dedup(spark, corpus):
    out = curate_corpus(corpus, min_quality=0.4, langs=("en",),
                        min_tokens=10).toPandas()
    ids = sorted(out.doc_id)
    assert 1 not in ids          # exact dup of 0: min id kept
    assert 0 in ids
    assert 2 not in ids          # spanish
    assert 3 not in ids          # too short
    assert 5 not in ids          # punctuation junk → low quality
    assert {"quality_score", "lang_pred", "content"} <= set(out.columns)
    assert (out.lang_pred == "en").all()


def test_near_dup_clusters_keep_highest_quality(spark, corpus):
    # near-dup pair supplied externally (docs 6/7 differ by one word);
    # canonical = highest quality, ties → smallest id
    pairs = spark.createDataFrame(pd.DataFrame(
        {"doc_a": [6], "doc_b": [7]}))
    out = curate_corpus(corpus, min_quality=0.3, langs=("en",),
                        near_dup_pairs=pairs).toPandas()
    ids = set(out.doc_id)
    assert len(ids & {6, 7}) == 1
    # quality tie-break is deterministic: recompute and check the winner
    q = dict(zip(out.doc_id, out.quality_score))
    survivor = (ids & {6, 7}).pop()
    assert survivor in (6, 7) and q[survivor] > 0


def test_no_gates_is_identity_plus_annotations(spark, corpus):
    out = curate_corpus(corpus, exact_dedup=False).toPandas()
    assert sorted(out.doc_id) == list(range(8))


def test_gates_are_codegen_map_stage(spark, corpus):
    """The quality/lang gates are pure map-stage Catalyst expressions
    inlined on the scan: with dedup off the plan has ZERO shuffles, and
    with exact dedup on it has exactly the one hash-window exchange."""
    out = curate_corpus(corpus, min_quality=0.4, langs=("en",),
                        exact_dedup=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    out = curate_corpus(corpus, min_quality=0.4, langs=("en",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_id_col_collision_raises(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "uid": [1], "doc_id": [7], "content": ["x"]}))
    with pytest.raises(ValueError, match="doc_id"):
        curate_corpus(docs, id_col="uid")
