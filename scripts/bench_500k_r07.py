#!/usr/bin/env python
"""Round-7 scale check: do the r7 query-path optimizations hold at
500k docs (100× the bench sf0.1 corpus)?

Builds a 500k-doc deterministic corpus + P=32 index on local[32], then
times the bench-style single queries and batch with the SAME search()
call shape bench.py uses, and records the kernel task count the sizing
heuristic picks (it must return to one-task-per-pid once the postings
volume crosses the target).  Writes BENCH_500K_r07.json.  Run QUIET.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/dev/shm/pim_r07" if os.path.isdir("/dev/shm") else "/tmp/pim_r07"
N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "500000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = 2


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("bench_500k_r07")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "24g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pim_lucene_spark import IndexConfig
    from pim_lucene_spark.corpus import generate_corpus
    from pim_lucene_spark.operators import search as S
    from pim_lucene_spark.operators.index_build import build_index

    corpus = f"{WORK}/corpus_{N_DOCS}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        generate_corpus(spark, N_DOCS, num_partitions=64) \
            .write.mode("overwrite").parquet(corpus)
    docs = spark.read.parquet(corpus).withColumnRenamed("text", "content")

    idx = f"{WORK}/idx_{N_DOCS}_r07"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    manifest = build_index(spark, docs, idx,
                           IndexConfig(num_partitions=32, num_segments=4,
                                       build_chunks=1),
                           content_col="content", id_col="doc_id")
    build_sec = time.time() - t0

    # queries from the corpus's OWN vocabulary (the generated 500k corpus
    # is code-like; bench.py's English terms would all short-circuit)
    import pyarrow.parquet as pq
    st = pq.read_table(manifest.stats_path).to_pandas() \
        .sort_values(["doc_freq", "term"], ascending=[False, True])
    terms = st["term"].tolist()
    hot, mid = terms[0], terms[len(terms) // 3]
    tv = terms
    QUERIES = {
        "q_term_hot": hot, "q_term_mid": mid,
        "q_phrase2": f"{tv[0]} {tv[1]}",
        "q_phrase3": f"{tv[2]} {tv[2]} {tv[2]}",
        "q_phrase4": f"{tv[3]} {tv[4]} {tv[5]} {tv[6]}",
        "q_phrase_miss": f"{tv[0]} zzzznotfound",
    }
    BATCH = [(i, f"{tv[i]} {tv[i + 1]}") for i in range(20)]

    S.search(spark, manifest, [(0, hot)], k=10).count()  # warm

    per = {}
    for name, text in QUERIES.items():
        best = float("inf")
        for _ in range(REPS):
            t = time.time()
            S.search(spark, manifest, [(0, text)], k=10,
                     final_merge="driver").collect()
            best = min(best, time.time() - t)
        per[name] = round(best, 4)
    best = float("inf")
    for _ in range(REPS):
        t = time.time()
        S.search(spark, manifest, BATCH, k=10, final_merge="driver").collect()
        best = min(best, time.time() - t)
    per["q_batch20"] = round(best, 4)

    # the sizing heuristic's decision for the hot phrase and the batch
    dfs_hot = S.term_doc_freqs(spark, manifest, [tv[0], tv[1]])
    if hasattr(S, "_kernel_task_count"):
        n_hot = S._kernel_task_count(32, sum(dfs_hot.values()))
    else:  # round-start tree: fixed groupBy width
        n_hot = -1
    local_ms = None
    S.search_local(manifest, [(0, QUERIES["q_phrase2"])], k=10)  # warm
    t = time.time()
    for _ in range(10):
        for text in QUERIES.values():
            S.search_local(manifest, [(0, text)], k=10)
    local_ms = (time.time() - t) / (10 * len(QUERIES)) * 1000

    out = {
        "metric": "r07_scale_check", "docs": N_DOCS, "cpus": CPUS,
        "index_build_sec": round(build_sec, 2),
        "docs_per_sec": round(N_DOCS / build_sec, 1),
        "queries": per,
        "total_query_sec": round(sum(per.values()), 4),
        "kernel_tasks_hot_phrase": int(n_hot),
        "local_ms_per_query": round(local_ms, 2),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_500K_r07.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
