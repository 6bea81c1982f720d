#!/usr/bin/env python
"""Benchmark: index-build throughput + BM25 query latency at a given SF.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": <sf>,
   "index_build_sec": ..., "index_docs_per_sec": ...,
   "batch_qps": ..., "p95_query_sec": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

Methodology mirrors the reference benchmark driver
(``SearchWikiDPUMultiThread.java:138-163``): fixed query set, wall-clock
QPS, per-query latency; query batching amortizes one scan per batch
(``PimSystemManager.java:401-437`` semantics).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline engine queries (vocabulary guaranteed by the synthetic corpus)
BENCH_QUERIES = {
    "q_term_hot": "the",
    "q_term_mid": "vector",
    "q_phrase2": "the fast",
    "q_phrase3": "batch batch batch",
    "q_phrase4": "table scan merge part",
    "q_phrase_miss": "merge zzzznotfound",
}
BATCH = [(i, q) for i, q in enumerate([
    "the fast", "key order", "sort table", "scan merge", "part window",
    "small hash", "join order", "batch batch", "stream spark", "window dup",
    "merge", "vector", "customer line", "group query row", "data slow",
    "filter customer", "value merge", "agg line", "big merge", "spark table",
])]


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{CPUS}]")
             .appName("pim_lucene_spark_bench")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pim_lucene_spark import IndexConfig
    from pim_lucene_spark.operators.index_build import build_index
    from pim_lucene_spark.operators.search import search

    docs = (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .withColumnRenamed("text", "content"))
    n_docs = docs.count()

    index_dir = f"/tmp/pim_bench_index_{os.getpid()}"
    shutil.rmtree(index_dir, ignore_errors=True)
    cfg = IndexConfig(num_partitions=max(CPUS, 8), num_segments=4,
                      build_chunks=1)
    t0 = time.time()
    manifest = build_index(spark, docs, index_dir, cfg,
                           content_col="content", id_col="doc_id",
                           source=SF_DIR)
    build_sec = time.time() - t0

    # warm-up (JIT + file cache), not timed
    search(spark, manifest, [(0, "the")], k=10).count()

    # per-query latency: best of REPS (this shared VM shows ~2x run noise;
    # same convention as bench_scaling.py).  The warm postings cache is
    # OFF for the distributed jobs and ON for the serving paths: Spark
    # gives no pid→worker affinity across jobs, so distributed warm hits
    # rarely land while the cache's prefer-full-decode residency trade
    # makes every cold decode strictly more expensive (measured: cache=256
    # cost +24% on q_phrase4 and +19% on the batch vs cache=0, round-4
    # regression bisect) — whereas the resident, pid-pinned serving
    # workers are exactly the reference's loaded-index regime and the
    # cache doubles their QPS (631 vs 308 measured same day).
    REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    CACHE_MB = int(os.environ.get("SPARK_GRAFT_POSTINGS_CACHE_MB", "256"))
    DIST_CACHE_MB = int(os.environ.get("SPARK_GRAFT_DIST_CACHE_MB", "0"))
    per_query: dict[str, float] = {}
    lat = []
    for name, text in BENCH_QUERIES.items():
        best = float("inf")
        for _ in range(REPS):
            t = time.time()
            # driver-side top-k merge (host merge of topdocs_sync.c):
            # lowest latency for small k
            search(spark, manifest, [(0, text)], k=10,
                   final_merge="driver",
                   postings_cache_mb=DIST_CACHE_MB).collect()
            best = min(best, time.time() - t)
        per_query[name] = round(best, 4)
        lat.append(best)

    # serving path: same kernel, no Spark job (the reference's
    # resident-index query route) — report warm per-query latency
    from pim_lucene_spark.operators.search import search_local
    search_local(manifest, [(0, "the")], k=10)  # warm
    t = time.time()
    for _ in range(20):
        for _, text in BENCH_QUERIES.items():
            search_local(manifest, [(0, text)], k=10)
    local_ms = (time.time() - t) / (20 * len(BENCH_QUERIES)) * 1000

    # sharded serving throughput: W resident worker processes, replica
    # placement (whole batches round-robin) — the multithreaded-searcher
    # analogue; many repeats of the 20-query batch
    from pim_lucene_spark.serving import ShardedServer
    serve_workers = int(os.environ.get("SPARK_GRAFT_SERVE_WORKERS", "8"))
    reps_batches = [BATCH] * 40
    with ShardedServer(manifest, num_workers=serve_workers,
                       mode="replica", postings_cache_mb=CACHE_MB) as srv:
        srv.map(reps_batches[:serve_workers], k=10)  # warm every worker
        t = time.time()
        srv.map(reps_batches, k=10)
        serve_qps = len(BATCH) * len(reps_batches) / (time.time() - t)

    # batched throughput: the whole query set in one job
    batch_sec = float("inf")
    for _ in range(REPS):
        t = time.time()
        search(spark, manifest, BATCH, k=10, final_merge="driver",
               postings_cache_mb=DIST_CACHE_MB).collect()
        batch_sec = min(batch_sec, time.time() - t)
    per_query["q_batch20"] = round(batch_sec, 4)

    total = round(sum(per_query.values()), 4)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "index_build_plus_bm25_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "docs": int(n_docs),
        "index_build_sec": round(build_sec, 3),
        "index_docs_per_sec": round(n_docs / build_sec, 1),
        "batch_qps": round(len(BATCH) / batch_sec, 2),
        "p95_query_sec": round(float(np.percentile(lat, 95)), 4),
        "cpus": CPUS,
        "latency_reps": REPS,
        "local_ms_per_query": round(local_ms, 2),
        "serving_replica_qps": round(serve_qps, 2),
        "serve_workers": serve_workers,
    }
    shutil.rmtree(index_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
