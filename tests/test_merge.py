"""Multi-way index merge (operator B6): merged index must be equivalent to
the brute-force model over the concatenated corpus, with Lucene-style
doc-base offsets (partition-preserving, rounded up to a multiple of P)."""

import os

import numpy as np
import pandas as pd
import pytest

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.model import BruteForceModel
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.operators.merge import merge_indexes
from pim_lucene_spark.operators.search import search

DOCS_A = pd.DataFrame({
    "doc_id": range(5),
    "content": [
        "blah blah blah blah blah youpi blah blah blah",
        "red orange white orange red",
        "green red",
        "one two three two one",
        "alpha beta gamma alpha",
    ],
})
DOCS_B = pd.DataFrame({
    "doc_id": range(7),
    "content": [
        "Une phrase a trouver ici Une phrase a trouver la",
        "red green blue",
        "blah youpi blah",
        "two one two one",
        "gamma delta epsilon",
        "orange you glad",
        "white red white red white",
    ],
})
QUERIES = [
    (0, "blah blah"), (1, "red"), (2, "two one"), (3, "Une phrase a trouver"),
    (4, "white red white"), (5, "gamma"), (6, "orange"), (7, "red green"),
]


@pytest.mark.parametrize("parts,segs", [(2, 2), (3, 1)])
def test_merge_matches_model_on_union(spark, tmp_index_dir, parts, segs):
    cfg = IndexConfig(num_partitions=parts, num_segments=segs, build_chunks=1)
    m_a = build_index(spark, spark.createDataFrame(DOCS_A),
                      os.path.join(tmp_index_dir, "a"), cfg,
                      content_col="content", id_col="doc_id")
    m_b = build_index(spark, spark.createDataFrame(DOCS_B),
                      os.path.join(tmp_index_dir, "b"), cfg,
                      content_col="content", id_col="doc_id")
    merged = merge_indexes(spark, [m_a, m_b],
                           os.path.join(tmp_index_dir, "merged"),
                           num_segments=segs)

    base_b = -(-len(DOCS_A) // parts) * parts  # round up to multiple of P
    union = pd.concat([
        DOCS_A,
        DOCS_B.assign(doc_id=DOCS_B.doc_id + base_b),
    ], ignore_index=True)
    model = BruteForceModel(union)

    res = search(spark, merged, QUERIES, k=10).toPandas()
    for qid, text in QUERIES:
        expected = model.search_phrase(text, k=10)
        got = res[res.qid == qid].sort_values(
            ["score", "doc_id"], ascending=[False, True])
        assert got.doc_id.tolist() == expected.doc_id.tolist(), text
        assert got.freq.tolist() == expected.freq.tolist(), text
        np.testing.assert_array_equal(
            np.float32(got.score.to_numpy()),
            np.float32(expected.score.to_numpy()), err_msg=text)

    # merged collection stats are exact sums
    assert merged.doc_count == len(DOCS_A) + len(DOCS_B)
    stats = (spark.read.parquet(merged.stats_path).toPandas()
             .set_index("term"))
    toks = union.content.str.split().explode()
    per_doc = toks.groupby([union.loc[toks.index, "doc_id"], toks]).size()
    assert int(stats.loc["red", "doc_freq"]) == \
        int((per_doc.xs("red", level=1) > 0).sum())
    assert int(stats.loc["red", "total_tf"]) == int((toks == "red").sum())


def test_merge_three_way_with_striping(spark, tmp_index_dir):
    cfg = IndexConfig(num_partitions=2, num_segments=2, build_chunks=1,
                      max_postings_per_stripe=1)
    parts = []
    frames = [DOCS_A, DOCS_B, DOCS_A.assign(
        content=DOCS_A.content.str.replace("blah", "noise"))]
    for i, frame in enumerate(frames):
        parts.append(build_index(
            spark, spark.createDataFrame(frame),
            os.path.join(tmp_index_dir, f"s{i}"), cfg,
            content_col="content", id_col="doc_id"))
    merged = merge_indexes(spark, parts,
                           os.path.join(tmp_index_dir, "merged3"))

    base1 = -(-len(DOCS_A) // 2) * 2
    base2 = base1 + -(-len(DOCS_B) // 2) * 2
    union = pd.concat([
        frames[0],
        frames[1].assign(doc_id=frames[1].doc_id + base1),
        frames[2].assign(doc_id=frames[2].doc_id + base2),
    ], ignore_index=True)
    model = BruteForceModel(union)
    res = search(spark, merged, QUERIES + [(8, "noise noise")], k=10).toPandas()
    for qid, text in QUERIES + [(8, "noise noise")]:
        expected = model.search_phrase(text, k=10)
        got = res[res.qid == qid].sort_values(
            ["score", "doc_id"], ascending=[False, True])
        assert got.doc_id.tolist() == expected.doc_id.tolist(), text
        np.testing.assert_array_equal(
            np.float32(got.score.to_numpy()),
            np.float32(expected.score.to_numpy()), err_msg=text)
