"""Tests for the deterministic synthetic source-code corpus generator."""

import numpy as np

from pim_lucene_spark.corpus import CORPUS_SCHEMA, KEYWORDS, generate_corpus


def test_schema_and_density(spark):
    df = generate_corpus(spark, 200, seed=7, num_partitions=4)
    assert [f.name for f in df.schema.fields] == \
        [f.name for f in CORPUS_SCHEMA.fields]
    pdf = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert pdf.doc_id.tolist() == list(range(200))
    assert (pdf.content.str.len() > 0).all()
    assert pdf.commit.str.len().eq(10).all()


def test_partition_independent_determinism(spark):
    """Same corpus regardless of parallelism — required by the scaling
    protocol (identical input at local[8] and local[32])."""
    a = (generate_corpus(spark, 120, seed=42, num_partitions=2)
         .toPandas().sort_values("doc_id").reset_index(drop=True))
    b = (generate_corpus(spark, 120, seed=42, num_partitions=13)
         .toPandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_zipf_skew_present(spark):
    """Hot keywords must dominate: the head term should be ~orders of
    magnitude more frequent than the tail (exercises posting striping)."""
    pdf = generate_corpus(spark, 300, seed=42, num_partitions=4).toPandas()
    toks = pdf.content.str.split().explode()
    counts = toks.value_counts()
    assert counts.index[0] in KEYWORDS
    head = counts.iloc[0]
    median = np.median(counts.to_numpy())
    assert head > 50 * median
