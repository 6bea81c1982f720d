"""`standard` tokenizer: StandardAnalyzer-equivalent semantics (lowercase +
UAX#29 word-break approximation, ``IndexRAMDPU.java:90``) pinned against
hand-derived Lucene expectations, analyzer parity across all entry points,
and end-to-end index/search/oracle agreement on a mixed-case corpus."""

import os

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.functions.tokenize import (
    token_counts,
    tokenize_one,
    tokenize_series,
    tokenize_to_codes,
)
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.operators.search import search
from pim_lucene_spark.plans.router import brute_force_search

# (input, StandardAnalyzer-on-ASCII expected output)
PINNED = [
    ("The quick-brown foxes, don't jump! 3.14 v2 a_b",
     ["the", "quick", "brown", "foxes", "don't", "jump", "3.14", "v2",
      "a_b"]),
    ("O'Neill's co-op re.engineer 1,024.5",
     ["o'neill's", "co", "op", "re.engineer", "1,024.5"]),
    # mixed-category and double medials split per UAX#29
    ("a.1 A..B x'y'z", ["a", "1", "a", "b", "x'y'z"]),
    ("CAFÉ über Москва", ["café", "über", "москва"]),
    ("", []),
    ("  ...  ", []),
    ("end. 'quoted' trailing'", ["end", "quoted", "trailing"]),
]


@pytest.mark.parametrize("text,expected", PINNED)
def test_standard_pinned(text, expected):
    assert tokenize_one(text, "standard") == expected


def test_standard_entry_points_agree():
    texts = pd.Series([t for t, _ in PINNED])
    # tokenize_series
    per_series = tokenize_series(texts, "standard").tolist()
    assert per_series == [e for _, e in PINNED]
    # token_counts
    np.testing.assert_array_equal(
        token_counts(texts, "standard"),
        np.array([len(e) for _, e in PINNED]))
    # tokenize_to_codes round-trip
    doc_idx, codes, pos, uniques = tokenize_to_codes(texts, "standard")
    for d, (_, expected) in enumerate(PINNED):
        got = [uniques[c] for c, dd in zip(codes, doc_idx) if dd == d]
        assert got == expected
    # positions are per-doc ordinals
    for d in np.unique(doc_idx):
        p = pos[doc_idx == d]
        np.testing.assert_array_equal(p, np.arange(p.size))


MIXED_DOCS = pd.DataFrame({
    "doc_id": range(6),
    "content": [
        "The FAST table-scan; the merge!",
        "Don't MERGE the Table.",
        "fast Fast FAST (fast?)",
        "3.14 approx of Pi; don't round to 3",
        "merge merge, MERGE: Merge",
        "the... the... THE",
    ],
})

STD_QUERIES = [(0, "The Fast"), (1, "don't"), (2, "MERGE"),
               (3, "the merge"), (4, "3.14"), (5, "table scan")]


def test_standard_indexed_equals_fallback(spark, tmp_index_dir):
    """Indexed standard search == brute-force standard scan (float parity)."""
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1,
                      tokenizer="standard")
    sdf = spark.createDataFrame(MIXED_DOCS)
    m = build_index(spark, sdf, tmp_index_dir, cfg,
                    content_col="content", id_col="doc_id")
    assert m.tokenizer == "standard"
    via_index = (search(spark, m, STD_QUERIES, k=10).toPandas()
                 .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    via_scan = (brute_force_search(sdf, STD_QUERIES, k=10,
                                   tokenizer="standard").toPandas()
                .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(via_index, via_scan)
    # case-folding actually happened: phrase "The Fast" matches "The FAST",
    # term "MERGE" matches every case variant
    assert set(via_index[via_index.qid == 0].doc_id) == {0}
    assert set(via_index[via_index.qid == 2].doc_id) == {0, 1, 4}
    assert set(via_index[via_index.qid == 4].doc_id) == {3}


def test_standard_matches_duckdb_oracle(spark, tmp_index_dir):
    duckdb = pytest.importorskip("duckdb")
    from pim_lucene_spark.oracle import phrase_bm25_sql
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1,
                      tokenizer="standard")
    m = build_index(spark, spark.createDataFrame(MIXED_DOCS), tmp_index_dir,
                    cfg, content_col="content", id_col="doc_id")
    res = (search(spark, m, STD_QUERIES, k=10, precision="float64")
           .toPandas()
           .assign(score=lambda d: d.score.round(6))
           [["qid", "doc_id", "freq", "score"]]
           .sort_values(["qid", "doc_id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", MIXED_DOCS.rename(columns={"content": "text"}))
    odf = (con.execute(phrase_bm25_sql(STD_QUERIES, k=10,
                                       tokenizer="standard"))
           .fetchdf().sort_values(["qid", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(res, odf.astype(res.dtypes.to_dict()))


def test_vocab_rank_uses_restored_medials():
    """Sorted-uniques contract (BytesRef.compareTo order) must rank by the
    RESTORED characters: ',' (0x2C) < '.' (0x2E), though the protection
    placeholders (\\x02=. \\x03=,) sort the other way."""
    import pandas as pd
    from pim_lucene_spark.functions.tokenize import tokenize_to_codes
    doc_idx, codes, pos, uniques = tokenize_to_codes(
        pd.Series(["1.5 1,5 a'b z"]), "standard")
    assert list(uniques) == sorted(uniques)
    assert list(uniques) == ["1,5", "1.5", "a'b", "z"]
    # codes must point at the right restored terms, in doc order
    assert [uniques[c] for c in codes] == ["1.5", "1,5", "a'b", "z"]
