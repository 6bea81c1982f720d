"""Cluster resolution over near-dup pairs (connected components +
canonical pick) — VERDICT r5 item 4: pairs alone don't dedup a corpus."""

import pandas as pd
import pytest

from pim_lucene_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
    drop_duplicates_clustered,
    minhash_lsh_pairs,
)


def _pairs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows,
                                              columns=["doc_a", "doc_b"]))


def test_components_chain_and_islands(spark):
    # 1-2-3 chained (transitive, never a direct 1-3 pair), 7-8 island,
    # 5-5 self loop ignored
    comp = connected_components(
        _pairs(spark, [(1, 2), (2, 3), (7, 8), (5, 5)])).toPandas()
    got = dict(zip(comp.doc_id, comp.cluster_id))
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_components_cycle_and_reversed_edges(spark):
    comp = connected_components(
        _pairs(spark, [(4, 2), (2, 9), (9, 4), (11, 10)])).toPandas()
    got = dict(zip(comp.doc_id, comp.cluster_id))
    assert got == {2: 2, 4: 2, 9: 2, 10: 10, 11: 10}


def test_components_long_path_needs_multiple_rounds(spark):
    # a 12-node path: diameter 11 forces several propagation rounds
    edges = [(i, i + 1) for i in range(100, 112)]
    comp = connected_components(_pairs(spark, edges)).toPandas()
    assert set(comp.cluster_id) == {100}
    assert len(comp) == 13


def test_components_max_iter_raises(spark):
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(_pairs(spark, [(i, i + 1)
                                            for i in range(20)]),
                             max_iter=2)


def test_dedup_clusters_sizes(spark):
    out = dedup_clusters(_pairs(spark, [(1, 2), (2, 3), (7, 8)])).toPandas()
    sizes = dict(zip(out.doc_id, out.cluster_size))
    assert sizes == {1: 3, 2: 3, 3: 3, 7: 2, 8: 2}


def test_drop_duplicates_min_id(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 7, 8, 99],
        "content": ["a", "b", "c", "d", "e", "solo"],
    }))
    kept = drop_duplicates_clustered(
        docs, _pairs(spark, [(1, 2), (2, 3), (7, 8)])).toPandas()
    assert sorted(kept.doc_id) == [1, 7, 99]  # min id per cluster + solo
    assert set(kept.columns) == {"doc_id", "content"}


def test_drop_duplicates_prefer_col(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 7, 8],
        "quality": [0.1, 0.9, 0.9, 0.5, 0.5],
    }))
    kept = drop_duplicates_clustered(
        docs, _pairs(spark, [(1, 2), (2, 3), (7, 8)]),
        prefer_col="quality").toPandas()
    # cluster {1,2,3}: max quality ties 2 vs 3 → smaller id 2
    # cluster {7,8}: tie → 7
    assert sorted(kept.doc_id) == [2, 7]


def test_clusters_match_duckdb_recursive_oracle(spark):
    """Differential vs DuckDB transitive closure on the sf0.001 minhash
    pair set (the contract entry's shape)."""
    import duckdb
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .withColumnRenamed("text", "content"))
    pairs = minhash_lsh_pairs(docs, num_hashes=32, bands=16,
                              threshold=0.01, hash_fn="portable")
    got = (dedup_clusters(pairs).toPandas()
           .sort_values(["doc_id"]).reset_index(drop=True))
    pdf = pairs.select("doc_a", "doc_b").toPandas()
    con = duckdb.connect()
    con.register("pairs", pdf)
    ora = con.execute("""
        WITH RECURSIVE
        edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        nodes AS (SELECT DISTINCT a AS id FROM edges),
        reach(id, r) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r)
        SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
        ORDER BY doc_id""").fetchdf()
    assert list(got.doc_id) == list(ora.doc_id)
    assert list(got.cluster_id) == list(ora.cluster_id)


def test_drop_duplicates_survives_filtered_min_member(spark):
    """/code-review r6: when the cluster's min-id member was filtered
    out of docs upstream, the cluster must still keep one survivor."""
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [42, 43, 99],  # 10 (the cluster min) is NOT present
        "content": ["b", "c", "solo"],
    }))
    kept = drop_duplicates_clustered(
        docs, _pairs(spark, [(10, 42), (42, 43)])).toPandas()
    assert sorted(kept.doc_id) == [42, 99]


def test_drop_duplicates_with_duplicate_id_rows(spark):
    """/code-review r6 pass 2: duplicate-id rows in docs (the very input
    a dedup pipeline ingests) must not push the canonical's second copy
    into the loser set and delete the whole cluster."""
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [5, 5, 7, 9],
        "content": ["a", "a-copy", "b", "solo"],
    }))
    kept = drop_duplicates_clustered(
        docs, _pairs(spark, [(5, 7)])).toPandas()
    # canonical id 5 survives (both its rows — id-level dedup is the
    # caller's exact-dedup step), 7 drops, 9 untouched
    assert sorted(kept.doc_id) == [5, 5, 9]
    # prefer_col path: same contract
    docs2 = spark.createDataFrame(pd.DataFrame({
        "doc_id": [5, 5, 7], "q": [0.1, 0.2, 0.9]}))
    kept2 = drop_duplicates_clustered(
        docs2, _pairs(spark, [(5, 7)]), prefer_col="q").toPandas()
    assert sorted(kept2.doc_id) == [7]
