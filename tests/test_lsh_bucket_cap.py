"""Oversized-LSH-bucket routing: the cap must keep the plan linear on
boilerplate corpora without silently losing exact-duplicate pairs.

Fixture: 120 identical boilerplate docs (one giant bucket in every band)
+ a handful of genuine near-dup pairs.  With a cap of 30:

- the boilerplate group's pairs survive as the linear star
  (min-id -> each member), verified like any candidate,
- every pair not involving the boilerplate group equals the uncapped run,
- the quadratic within-group join never happens (pair count is linear).
"""

import pandas as pd
import pytest

from pim_lucene_spark.operators import dedup

BOILER = "the same license header appears in every generated file here"
N_BOILER = 120


@pytest.fixture(scope="module")
def docs(spark):
    rows = [{"doc_id": i, "content": BOILER} for i in range(N_BOILER)]
    rows += [
        {"doc_id": 200, "content": "alpha beta gamma delta epsilon zeta"},
        {"doc_id": 201, "content": "alpha beta gamma delta epsilon eta"},
        {"doc_id": 202, "content": "completely different text about spark"},
    ]
    return spark.createDataFrame(pd.DataFrame(rows)).persist()


def _pairs(df):
    return {(int(a), int(b)) for a, b in zip(df.doc_a, df.doc_b)}


@pytest.mark.parametrize("fn,kw,valcol", [
    (dedup.minhash_lsh_pairs,
     dict(num_hashes=16, bands=8, threshold=0.2), "jaccard"),
    (dedup.simhash_pairs, dict(max_hamming=3), "hamming"),
])
def test_capped_run_keeps_exact_dup_pairs_linear(docs, fn, kw, valcol):
    capped = fn(docs, max_bucket_size=30, **kw).toPandas()
    uncapped = fn(docs, max_bucket_size=None, **kw).toPandas()
    cp, up = _pairs(capped), _pairs(uncapped)
    boiler = set(range(N_BOILER))
    # pairs outside the boilerplate group: identical
    assert {p for p in cp if not set(p) & boiler} == \
        {p for p in up if not set(p) & boiler}
    # boilerplate group: the star (0 -> each member) survives, linear size
    star = {(0, b) for b in range(1, N_BOILER)}
    in_group_capped = {p for p in cp if set(p) <= boiler}
    assert in_group_capped == star
    assert len(in_group_capped) == N_BOILER - 1  # not quadratic
    # values on star pairs are exact-dup values
    got = capped.set_index(["doc_a", "doc_b"])[valcol]
    expected = 1.0 if valcol == "jaccard" else 0
    assert all(got[p] == expected for p in star)


def test_uncapped_is_quadratic_on_the_group(docs):
    up = dedup.simhash_pairs(docs, max_hamming=3,
                             max_bucket_size=None).toPandas()
    in_group = {p for p in _pairs(up) if set(p) <= set(range(N_BOILER))}
    assert len(in_group) == N_BOILER * (N_BOILER - 1) // 2
