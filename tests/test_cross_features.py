"""Cross-feature composition: round-6 surfaces combined with the
existing multi-field / parser / deletes machinery."""

import pandas as pd
import pytest

from pim_lucene_spark import (
    BooleanQuery,
    IndexConfig,
    IntervalQuery,
    MultiFieldIndex,
)
from pim_lucene_spark.plans.query import FieldedQuery


@pytest.fixture(scope="module")
def mf_eng(spark, tmp_path_factory):
    docs = pd.DataFrame({
        "doc_id": range(4),
        "title": ["the fast tables", "slow scans", "the merge plans",
                  "fast merges"],
        "body": ["sort the window here", "sort window now",
                 "the dog's bones", "window sort the end"],
    })
    d = str(tmp_path_factory.mktemp("mfe") / "idx")
    return MultiFieldIndex.build(
        spark, spark.createDataFrame(docs), d,
        fields={"title": "title", "body": "body"},
        cfg=IndexConfig(num_partitions=2, num_segments=2, build_chunks=1,
                        tokenizer="english"),
        id_col="doc_id")


def test_multifield_english_stemming_and_gaps(spark, mf_eng):
    # plural query stems to the indexed singular per field
    t = mf_eng.search([(0, "table")], k=10, field="title").toPandas()
    assert sorted(t.doc_id) == [0]
    t = mf_eng.search([(0, "fast merges")], k=10, field="title").toPandas()
    assert sorted(t.doc_id) == [3]
    # gapped query phrase within one field ("sort the window" → 0,2)
    b = mf_eng.search([(0, "sort the window")], k=10,
                      field="body").toPandas()
    # only doc0: sort@0, window@2 (gap); doc3 has window@0, sort@1 —
    # wrong order for the gapped query
    assert sorted(b.doc_id) == [0]


def test_fielded_interval_in_boolean(spark, mf_eng):
    from pim_lucene_spark.plans.boolean import search_boolean_fields
    q = BooleanQuery(must=[FieldedQuery(
        "body", IntervalQuery("sort window", ordered=False, max_gaps=1))])
    pdf = search_boolean_fields(spark, mf_eng.manifests, "body",
                                [(0, q)], k=10).toPandas()
    # unordered within 1 gap: doc1 sort@0,window@1 (adjacent); doc3
    # window@0,sort@1 (adjacent, any order); doc0 sort@0,window@2
    # (1 gap in ordinal space — "the" removed leaves the gap)
    assert sorted(pdf.doc_id) == [0, 1, 3]
