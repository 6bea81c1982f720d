"""searchAfter paging (Lucene ``IndexSearcher.searchAfter``).

The contract: page N+1 holds the next k hits STRICTLY after page N's
last (score, doc_id) mark in (score desc, doc asc) order, and the
concatenation of pages equals one big top-k search bit-for-bit.  The
mark filters inside the kernel BEFORE the per-partition top-k cut, so
deep pages ship the same <= P*k rows as page 1 — and both pruning
paths (block-max segment skip, phrase WAND chunk cut) count only
qualifying hits toward their cut.
"""

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.operators.search import (
    page_marks,
    search,
    search_local,
)


def _mk_corpus(n=2500, seed=11):
    rng = np.random.default_rng(seed)
    vocab = ["fast", "table", "scan", "merge", "part", "row",
             "query", "join", "order", "spark"]
    docs = []
    for i in range(n):
        ln = int(rng.integers(3, 30))
        docs.append(" ".join(rng.choice(vocab, size=ln)))
    # 40 identical docs: exact score TIES so the doc_id tie-break is
    # exercised across page boundaries
    for i in range(100, 140):
        docs[i] = "tie tie breaker case"
    docs[0] = " ".join(["the"] * 9)
    for i in (2, 3, 4):
        docs[i] = "zebra alpha " + docs[i]
    return pd.DataFrame({"doc_id": range(n), "content": docs})


@pytest.fixture(scope="module")
def pg_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pgidx"))
    corpus = _mk_corpus()
    cfg = IndexConfig(num_partitions=4, num_segments=8, build_chunks=1)
    m = build_index(spark, spark.createDataFrame(corpus), d, cfg,
                    content_col="content", id_col="doc_id")
    return m


QUERIES = [(1, "fast"), (2, "fast table"), (3, "tie tie"),
           (4, "tie breaker case")]


def _pages(spark, m, queries, page_k, n_pages, precision, **kw):
    """Collect n_pages successive pages as one ordered frame."""
    out, marks = [], None
    for _ in range(n_pages):
        page = (search(spark, m, queries, k=page_k, precision=precision,
                       after=marks, **kw)
                .toPandas()
                .sort_values(["qid", "score", "doc_id"],
                             ascending=[True, False, True])
                .reset_index(drop=True))
        if len(page) == 0:
            break
        out.append(page)
        marks = page_marks(page)
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


@pytest.mark.parametrize("precision", ["float32", "float64"])
def test_pages_concatenate_to_topk(spark, pg_index, precision):
    m = pg_index
    top30 = (search(spark, m, QUERIES, k=30, precision=precision)
             .toPandas()
             .sort_values(["qid", "score", "doc_id"],
                          ascending=[True, False, True])
             .reset_index(drop=True))
    paged = _pages(spark, m, QUERIES, page_k=10, n_pages=3,
                   precision=precision)
    paged = (paged.sort_values(["qid", "score", "doc_id"],
                               ascending=[True, False, True])
             .reset_index(drop=True))
    # every query has >= 30 hits in this corpus except possibly the
    # phrase ones — compare per qid up to the smaller length
    for qid in [q for q, _ in QUERIES]:
        a = top30[top30.qid == qid].reset_index(drop=True)
        b = paged[paged.qid == qid].reset_index(drop=True)
        assert len(a) == len(b), f"qid {qid}: {len(a)} vs {len(b)}"
        assert (a.doc_id.to_numpy() == b.doc_id.to_numpy()).all()
        assert (a.score.to_numpy() == b.score.to_numpy()).all()
        assert (a.freq.to_numpy() == b.freq.to_numpy()).all()


def test_tie_break_crosses_pages(spark, pg_index):
    """The 40 identical docs tie exactly; pages of 7 must walk them in
    doc_id order with no duplicate and no skip."""
    m = pg_index
    q = [(3, "tie breaker")]
    paged = _pages(spark, m, q, page_k=7, n_pages=6, precision="float32")
    docs = paged.doc_id.to_numpy()
    assert len(docs) == len(set(docs)), "duplicate hit across pages"
    flat = (search(spark, m, q, k=42, precision="float32").toPandas()
            .sort_values(["score", "doc_id"], ascending=[False, True]))
    assert (docs == flat.doc_id.to_numpy()[:len(docs)]).all()


def test_after_exhausted_returns_empty(spark, pg_index):
    m = pg_index
    q = [(4, "zebra alpha")]
    all_hits = search(spark, m, q, k=100).toPandas()
    assert 0 < len(all_hits) < 100
    marks = page_marks(all_hits)
    nxt = search(spark, m, q, k=10, after=marks).toPandas()
    assert len(nxt) == 0


@pytest.mark.parametrize("probe", [True, False])
def test_after_with_bound_probe_identical(spark, pg_index, probe):
    m = pg_index
    p1 = search(spark, m, QUERIES, k=10, bound_probe=probe).toPandas()
    marks = page_marks(p1)
    p2 = (search(spark, m, QUERIES, k=10, after=marks, bound_probe=probe)
          .toPandas()
          .sort_values(["qid", "score", "doc_id"],
                       ascending=[True, False, True])
          .reset_index(drop=True))
    ref = (search(spark, m, QUERIES, k=10, after=marks)
           .toPandas()
           .sort_values(["qid", "score", "doc_id"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(p2, ref)


def test_serving_path_after_matches_distributed(spark, pg_index):
    m = pg_index
    p1 = search(spark, m, QUERIES, k=10).toPandas()
    marks = page_marks(p1)
    dist = (search(spark, m, QUERIES, k=10, after=marks).toPandas()
            .sort_values(["qid", "score", "doc_id"],
                         ascending=[True, False, True])
            .reset_index(drop=True))
    loc = (search_local(m, QUERIES, k=10, after=marks)
           .sort_values(["qid", "score", "doc_id"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    assert (dist.doc_id.to_numpy() == loc.doc_id.to_numpy()).all()
    assert (dist.score.to_numpy() == loc.score.to_numpy()).all()
