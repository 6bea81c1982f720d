"""Randomized differential testing — the analogue of the reference's
RandomIndexWriter-based suites (``TestPimPhraseQuery.java:110``,
randomized corpora + QueryUtils/CheckHits invariants): seeded random
corpora and queries, engine vs pure-pandas model, exact float32 score
equality and identical doc order."""

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.model import BruteForceModel
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.operators.search import search


def _random_corpus(seed: int, n_docs: int) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    # small vocab → frequent repeats, palindromes, doubled words
    vocab = np.array(["a", "b", "c", "aa", "ab", "ba", "zz", "w1", "w2",
                      "éé", "日本", "x"], dtype=object)
    docs = []
    for _ in range(n_docs):
        n = rng.randint(1, 40)
        docs.append(" ".join(vocab[rng.randint(0, len(vocab), n)]))
    return pd.DataFrame({"doc_id": range(n_docs), "content": docs})


def _random_queries(seed: int, n: int) -> list:
    rng = np.random.RandomState(seed + 1)
    vocab = ["a", "b", "c", "aa", "ab", "ba", "zz", "w1", "w2", "éé",
             "日本", "x", "missing"]
    out = []
    for qid in range(n):
        ln = rng.randint(1, 4)
        out.append((qid, " ".join(vocab[i] for i in
                                  rng.randint(0, len(vocab), ln))))
    return out


@pytest.mark.parametrize("seed,parts,segs,k", [
    (7, 3, 2, 5), (21, 5, 3, 3), (99, 2, 1, 100),
])
def test_random_corpus_engine_vs_model(spark, tmp_index_dir, seed, parts,
                                       segs, k):
    docs = _random_corpus(seed, n_docs=40)
    queries = _random_queries(seed, n=12)
    cfg = IndexConfig(num_partitions=parts, num_segments=segs, build_chunks=2,
                      max_postings_per_stripe=7)  # exercise striping too
    m = build_index(spark, spark.createDataFrame(docs), tmp_index_dir, cfg,
                    content_col="content", id_col="doc_id")
    res = search(spark, m, queries, k=k).toPandas()
    model = BruteForceModel(docs)
    for qid, text in queries:
        expected = model.search_phrase(text, k=k)
        got = res[res.qid == qid].sort_values(
            ["score", "doc_id"], ascending=[False, True])
        assert got.doc_id.tolist() == expected.doc_id.tolist(), \
            f"seed={seed} q={text!r}"
        assert got.freq.tolist() == expected.freq.tolist(), \
            f"seed={seed} q={text!r}"
        np.testing.assert_array_equal(
            np.float32(got.score.to_numpy()),
            np.float32(expected.score.to_numpy()),
            err_msg=f"seed={seed} q={text!r}")
