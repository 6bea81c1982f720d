"""`english` analyzer: EnglishAnalyzer.java chain with the minimal
S-stemmer (EnglishMinimalStemmer.java:26-44) — stop-word position gaps
pinned by TestPimPhraseQuery.java:230-268 ("the stop words are here"
matches the exact phrase "stop words" under a stop analyzer)."""

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark import IndexConfig
from pim_lucene_spark.functions.tokenize import (
    ENGLISH_STOP_WORDS,
    s_stem,
    token_counts,
    tokenize_one,
    tokenize_series,
    tokenize_to_codes,
)


def test_s_stemmer_java_semantics():
    # (EnglishMinimalStemmer.java switch table)
    cases = {
        "dogs": "dog", "scans": "scan", "ponies": "pony", "ties": "ty",
        "dies": "dy", "series": "sery", "trees": "trees", "goes": "goes",
        "dias": "dias"[:-1], "chases": "chase", "us": "us", "is": "is",
        "bus": "bus", "class": "class", "gas": "ga", "aies": "aies",
        "eies": "eies", "axes": "axe", "values": "value", "keys": "key",
        "s": "s", "as": "as", "ies": "ies",
    }
    for w, exp in cases.items():
        assert s_stem(w) == exp, (w, s_stem(w), exp)


def test_stop_words_set_is_lucenes_33():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert {"the", "a", "will", "such", "their"} <= ENGLISH_STOP_WORDS
    assert "s" not in ENGLISH_STOP_WORDS


def test_reference_fixture_position_gaps():
    """TestPimPhraseQuery stop-analyzer doc: kept tokens retain their
    pre-removal ordinals ("stop"@1, "words"→"word"@2, "here"@4)."""
    di, codes, pos, uniq = tokenize_to_codes(
        pd.Series(["the stop words are here"]), "english")
    got = list(zip(uniq[codes].tolist(), pos.tolist()))
    assert got == [("stop", 1), ("word", 2), ("here", 4)]


def test_possessive_then_stop_then_stem():
    assert tokenize_one("The Dog's bones", "english") == ["dog", "bone"]
    # possessive strip happens BEFORE the stop check ("a's" → "a" → stop)
    assert tokenize_one("a's dogs", "english") == ["dog"]


def test_norms_count_kept_tokens_only():
    s = pd.Series(["the stop words are here", "the of and", ""])
    assert token_counts(s, "english").tolist() == [3, 0, 0]


def test_vocab_merge_after_stemming():
    """'dog's', 'dogs', 'dog' must share one vocabulary code."""
    di, codes, pos, uniq = tokenize_to_codes(
        pd.Series(["dog's dogs dog"]), "english")
    assert list(uniq) == ["dog"]
    assert codes.tolist() == [0, 0, 0]
    assert pos.tolist() == [0, 1, 2]


def test_tokenize_series_matches_tokenize_one():
    texts = ["The quick foxes jumped", "ponies and the class's gas",
             "", "a an and the"]
    ser = tokenize_series(pd.Series(texts), "english").tolist()
    assert ser == [tokenize_one(t, "english") for t in texts]


@pytest.fixture(scope="module")
def eng_index(spark, tmp_path_factory):
    from pim_lucene_spark.operators.index_build import build_index
    docs = pd.DataFrame({
        "doc_id": range(4),
        "content": [
            "the stop words are here",
            "stop words here now",        # adjacent, no gaps
            "words in the here",          # "words here" gapped by 2
            "The Dog's bones and ponies",
        ],
    })
    d = str(tmp_path_factory.mktemp("eng") / "idx")
    return build_index(spark, spark.createDataFrame(docs), d,
                       IndexConfig(2, 1, build_chunks=1,
                                   tokenizer="english"),
                       content_col="content", id_col="doc_id")


def test_engine_phrase_over_stop_gap(spark, eng_index):
    from pim_lucene_spark.operators.search import search
    # "stop words": docs 0 (via gap ordinals 1,2) and 1 (ordinals 0,1)
    hits = search(spark, eng_index, [(0, "stop words")], k=10).toPandas()
    assert sorted(hits.doc_id) == [0, 1]
    # "words here": doc 1 only — doc 0 has word@2/here@4, doc 2 word@0/
    # here@3 (stop-gap semantics make adjacency REAL ordinal adjacency)
    hits = search(spark, eng_index, [(1, "words here")], k=10).toPandas()
    assert sorted(hits.doc_id) == [1]
    # query-side chain parity: plural + possessive + stop analyze away
    hits = search(spark, eng_index, [(2, "the dogs bone")], k=10).toPandas()
    assert sorted(hits.doc_id) == [3]


def test_engine_matches_duckdb_english_oracle(spark, eng_index):
    import duckdb

    from pim_lucene_spark.operators.search import search
    from pim_lucene_spark.oracle import phrase_bm25_sql
    queries = [(0, "stop words"), (1, "words here"), (2, "dog's bones"),
               (3, "ponies"), (4, "the")]
    got = (search(spark, eng_index, queries, k=10, precision="float64")
           .toPandas().sort_values(["qid", "doc_id"])
           .reset_index(drop=True))
    docs = spark.read.parquet(eng_index.docs_path).toPandas()
    con = duckdb.connect()
    con.register("documents_raw", docs.rename(columns={"content": "text"}))
    con.execute("CREATE VIEW documents AS SELECT doc_id, text "
                "FROM documents_raw")
    ora = (con.execute(phrase_bm25_sql(queries, k=10, tokenizer="english"))
           .fetchdf().sort_values(["qid", "doc_id"]).reset_index(drop=True))
    assert list(got.qid) == list(ora.qid)
    assert list(got.doc_id) == list(ora.doc_id)
    assert list(got.freq.astype(float)) == list(ora.freq.astype(float))
    np.testing.assert_allclose(got.score.to_numpy(),
                               ora.score.to_numpy(), rtol=0, atol=5e-7)


def test_gapped_query_phrase_offsets():
    from pim_lucene_spark.functions.tokenize import tokenize_one_with_offsets
    # internal stop word → gapped PhraseQuery (Lucene QueryBuilder)
    terms, offs = tokenize_one_with_offsets("sort the window", "english")
    assert terms == ["sort", "window"] and offs == (0, 2)
    # leading stop word only shifts the start → no gap
    terms, offs = tokenize_one_with_offsets("the sort window", "english")
    assert terms == ["sort", "window"] and offs is None
    terms, offs = tokenize_one_with_offsets("sort window", "whitespace")
    assert offs is None


@pytest.fixture(scope="module")
def gap_index(spark, tmp_path_factory):
    from pim_lucene_spark.operators.index_build import build_index
    docs = pd.DataFrame({
        "doc_id": range(3),
        "content": [
            "sort the window",   # gapped: sort@0, window@2
            "sort window",       # adjacent: sort@0, window@1
            "sort it the window",  # two stops: sort@0, window@3
        ],
    })
    d = str(tmp_path_factory.mktemp("gap") / "idx")
    return build_index(spark, spark.createDataFrame(docs), d,
                       IndexConfig(2, 1, build_chunks=1,
                                   tokenizer="english"),
                       content_col="content", id_col="doc_id")


def test_gapped_query_matches_gapped_docs(spark, gap_index):
    from pim_lucene_spark.operators.search import search, search_local
    # "sort the window" → gapped query (0,2): matches ONLY doc 0
    hits = search(spark, gap_index, [(0, "sort the window")], k=10).toPandas()
    assert sorted(hits.doc_id) == [0]
    # "sort window" → consecutive: matches ONLY doc 1
    hits = search(spark, gap_index, [(1, "sort window")], k=10).toPandas()
    assert sorted(hits.doc_id) == [1]
    # "sort it the window" → gap 3: matches ONLY doc 2
    hits = search(spark, gap_index, [(2, "sort it the window")],
                  k=10).toPandas()
    assert sorted(hits.doc_id) == [2]
    # serving path parity
    loc = search_local(gap_index, [(0, "sort the window"),
                                   (1, "sort window")], k=10)
    assert sorted(loc[loc.qid == 0].doc_id) == [0]
    assert sorted(loc[loc.qid == 1].doc_id) == [1]


def test_gapped_query_in_boolean_and_scan_and_oracle(spark, gap_index):
    import duckdb

    from pim_lucene_spark.operators.search import search
    from pim_lucene_spark.oracle import phrase_bm25_sql
    from pim_lucene_spark.plans.boolean import BooleanQuery, search_boolean
    from pim_lucene_spark.plans.router import brute_force_search
    # compound kernel leaf
    got = search_boolean(
        spark, gap_index,
        [(0, BooleanQuery(must=["sort the window"]))], k=10).toPandas()
    assert sorted(got.doc_id) == [0]
    # brute-force scan path
    docs = (spark.read.parquet(gap_index.docs_path)
            .withColumnRenamed("text", "content"))
    sc = brute_force_search(docs, [(0, "sort the window")], k=10,
                            tokenizer="english").toPandas()
    assert sorted(sc.doc_id) == [0]
    # DuckDB oracle replays the same gapped join
    queries = [(0, "sort the window"), (1, "sort window"),
               (2, "sort it the window")]
    got = (search(spark, gap_index, queries, k=10, precision="float64")
           .toPandas().sort_values(["qid", "doc_id"]).reset_index(drop=True))
    con = duckdb.connect()
    pdf = spark.read.parquet(gap_index.docs_path).toPandas()
    col = "text" if "text" in pdf.columns else "content"
    con.register("docs_raw", pdf.rename(columns={col: "text"}))
    con.execute("CREATE VIEW documents AS SELECT doc_id, text FROM docs_raw")
    ora = (con.execute(phrase_bm25_sql(queries, k=10, tokenizer="english"))
           .fetchdf().sort_values(["qid", "doc_id"]).reset_index(drop=True))
    assert list(got.qid) == list(ora.qid)
    assert list(got.doc_id) == list(ora.doc_id)
    np.testing.assert_allclose(got.score.to_numpy(), ora.score.to_numpy(),
                               rtol=0, atol=5e-7)


def test_gapped_explain_matches_kernel(spark, gap_index):
    from pim_lucene_spark.operators.search import search
    from pim_lucene_spark.plans.explain import explain
    got = search(spark, gap_index, [(0, "sort the window")], k=10,
                 precision="float64").toPandas()
    s = dict(zip(got.doc_id, got.score))
    for d in range(3):
        ex = explain(gap_index, "sort the window", d, precision="float64")
        if d in s:
            assert ex["matches"] and ex["score"] == s[d]
        else:
            assert not ex["matches"]


def test_mixed_slop_batch_keeps_exact_gap_offsets(spark, gap_index):
    """/code-review r6: a mixed exact+sloppy batch routes through the
    sloppy kernel — its exact members must stay gap-aware (bit-identical
    to the pure-exact search path)."""
    from pim_lucene_spark.operators.search import search
    from pim_lucene_spark.plans.router import search_with_fallback
    batch = [(0, "sort the window"), (1, "sort window")]
    mixed = search_with_fallback(
        spark, gap_index, None, batch + [(2, "sort window")],
        k=10, slop={2: 2}).toPandas()
    pure = search(spark, gap_index, batch, k=10).toPandas()
    for qid in (0, 1):
        a = sorted(mixed[mixed.qid == qid].doc_id)
        b = sorted(pure[pure.qid == qid].doc_id)
        assert a == b, (qid, a, b)
    assert sorted(mixed[mixed.qid == 0].doc_id) == [0]
    assert sorted(mixed[mixed.qid == 1].doc_id) == [1]
