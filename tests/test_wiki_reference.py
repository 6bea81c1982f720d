"""The reference's own benchmark corpus end-to-end: wiki articles +
the natural-language phrase query set (``SearchWikiDPUMultiThread.java:
120-245`` protocol, sampled for test budget).

Three checks on REAL English text (everything else in the suite runs on
synthetic corpora):

1. indexed path == brute-force scan (rank + float32 score identity) — the
   ``results_diff.py`` analogue,
2. engine == DuckDB SQL replica of the standard analyzer + BM25 on the
   same articles — catches tokenizer surprises synthetic text can't,
3. the query file parses and phrases with missing terms short-circuit.
"""

import os

import numpy as np
import pytest

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from bench_wiki import REF_BASE, extract_wiki, load_queries, wiki_docs

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF_BASE}/datasets/wiki_small.tgz"),
    reason="reference benchmark dataset not present")

N_QUERIES = int(os.environ.get("WIKI_TEST_QUERIES", "25"))


@pytest.fixture(scope="module")
def wiki(spark):
    art = extract_wiki(f"{REF_BASE}/datasets/wiki_small.tgz")
    docs = wiki_docs(spark, art).persist()
    yield docs
    docs.unpersist()


@pytest.fixture(scope="module")
def wiki_index(spark, wiki, tmp_path_factory):
    from pim_lucene_spark import IndexConfig
    from pim_lucene_spark.operators.index_build import build_index
    cfg = IndexConfig(num_partitions=4, num_segments=2, build_chunks=1,
                      tokenizer="standard")
    return build_index(spark, wiki, str(tmp_path_factory.mktemp("widx")),
                       cfg, content_col="content", id_col="doc_id")


def _queries():
    qs = load_queries(f"{REF_BASE}/queries/requests_phrase_nl.txt")
    step = max(len(qs) // N_QUERIES, 1)
    return qs[::step][:N_QUERIES]


def test_indexed_equals_scan_on_wiki(spark, wiki, wiki_index):
    from pim_lucene_spark.operators.search import search
    from pim_lucene_spark.plans.router import brute_force_search
    queries = _queries()
    a = search(spark, wiki_index, queries, k=10).toPandas()
    b = brute_force_search(wiki, queries, k=10,
                           tokenizer="standard").toPandas()
    assert len(a), "no query matched — sample broken"
    for qid, text in queries:
        ra = a[a.qid == qid].sort_values(["score", "doc_id"],
                                         ascending=[False, True])
        rb = b[b.qid == qid].sort_values(["score", "doc_id"],
                                         ascending=[False, True])
        assert ra.doc_id.tolist() == rb.doc_id.tolist(), text
        np.testing.assert_array_equal(np.float32(ra.score.to_numpy()),
                                      np.float32(rb.score.to_numpy()),
                                      err_msg=text)


def test_engine_matches_duckdb_on_real_text(spark, wiki, wiki_index):
    duckdb = pytest.importorskip("duckdb")
    from pim_lucene_spark.operators.search import search
    from pim_lucene_spark.oracle import phrase_bm25_sql
    queries = _queries()[:10]
    res = (search(spark, wiki_index, queries, k=10, precision="float64")
           .toPandas())
    pdf = (wiki.selectExpr("doc_id", "content AS text").toPandas())
    con = duckdb.connect()
    con.register("documents", pdf)
    odf = con.execute(phrase_bm25_sql(queries, k=10,
                                      tokenizer="standard")).fetchdf()
    got = {(int(r.qid), int(r.doc_id)): round(float(r.score), 6)
           for r in res.itertuples()}
    exp = {(int(r.qid), int(r.doc_id)): round(float(r.score), 6)
           for r in odf.itertuples()}
    assert got == exp


def test_query_file_loads_fully():
    qs = load_queries(f"{REF_BASE}/queries/requests_phrase_nl.txt")
    assert len(qs) == 1036
    assert all(t.strip() for _, t in qs)


def test_missing_term_short_circuits(spark, wiki, wiki_index):
    from pim_lucene_spark.operators.search import search
    out = search(spark, wiki_index,
                 [(0, "zzzz unfindable qqqq")], k=10).count()
    assert out == 0
