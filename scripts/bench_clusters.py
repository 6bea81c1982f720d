#!/usr/bin/env python
"""Scale evidence for dedup cluster resolution (connected components).

Synthetic near-dup pair graph shaped like real dedup output: mostly
small near-clique clusters (boilerplate groups), a few large star
clusters (hot boilerplate), and some longer chains (transitive
near-dups) — deterministic, no external data.  Reports rounds to
convergence, wall time, and rows kept by drop_duplicates_clustered.

Writes BENCH_CLUSTERS.json. Env: CLUSTER_NODES (default 400000),
SPARK_GRAFT_CPUS (default 8).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_pairs(n_nodes: int, seed: int = 7) -> "np.ndarray":
    """Deterministic pair list (doc_a, doc_b) over ids [0, n_nodes)."""
    rng = np.random.default_rng(seed)
    pairs = []
    nid = 0
    # 80% of nodes in clusters of 2-5 (chain within the cluster)
    while nid < int(n_nodes * 0.8):
        size = int(rng.integers(2, 6))
        ids = np.arange(nid, min(nid + size, n_nodes))
        pairs.append(np.stack([ids[:-1], ids[1:]], axis=1))
        nid += size
    # 10% in 20 hot star clusters (boilerplate)
    star_pool = np.arange(nid, nid + int(n_nodes * 0.1))
    for chunk in np.array_split(star_pool, 20):
        if chunk.size > 1:
            pairs.append(np.stack([np.full(chunk.size - 1, chunk[0]),
                                   chunk[1:]], axis=1))
    nid = int(star_pool[-1]) + 1 if star_pool.size else nid
    # the rest: long chains of 64 (diameter stress — forces real rounds)
    tail = np.arange(nid, n_nodes)
    for chunk in np.array_split(tail, max(1, tail.size // 64)):
        if chunk.size > 1:
            pairs.append(np.stack([chunk[:-1], chunk[1:]], axis=1))
    return np.concatenate(pairs)


def main() -> None:
    from pyspark.sql import SparkSession

    from pim_lucene_spark.operators.dedup import (
        connected_components,
        drop_duplicates_clustered,
    )

    n_nodes = int(os.environ.get("CLUSTER_NODES", "400000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus * 2))
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    arr = synth_pairs(n_nodes)
    import pandas as pd
    pairs = spark.createDataFrame(
        pd.DataFrame(arr, columns=["doc_a", "doc_b"])).persist()
    n_pairs = pairs.count()

    t0 = time.time()
    comp = connected_components(pairs).persist()
    n_rows = comp.count()
    cc_s = time.time() - t0
    n_clusters = comp.select("cluster_id").distinct().count()

    docs = spark.range(n_nodes).withColumnRenamed("id", "doc_id")
    t0 = time.time()
    kept = drop_duplicates_clustered(docs, pairs).count()
    drop_s = time.time() - t0

    out = {
        "metric": "dedup_cluster_resolution",
        "n_nodes": n_nodes,
        "n_pairs": int(n_pairs),
        "clustered_nodes": int(n_rows),
        "n_clusters": int(n_clusters),
        "connected_components_sec": round(cc_s, 3),
        "drop_duplicates_sec": round(drop_s, 3),
        "kept_docs": int(kept),
        "pairs_per_sec": round(n_pairs / cc_s, 1),
        "cpus": cpus,
        "note": ("hash-min label propagation + pointer jumping, "
                 "localCheckpoint lineage truncation; rounds ~ "
                 "log(max component diameter) — 64-chains included as "
                 "the stress case"),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_CLUSTERS.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
