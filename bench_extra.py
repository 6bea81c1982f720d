#!/usr/bin/env python
"""Noop-sink isolation bench for the non-search operator families
(guide §1.4) — NOT the driver's bench (bench.py is frozen; this file
exists so optimization evidence can cite per-operator numbers).

Every timing uses ``df.write.format('noop')`` so the full computation of
every column is paid but no sink cost is.  Prints one JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{CPUS}]")
             .appName("pim_lucene_spark_bench_extra")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pim_lucene_spark.operators import (dedup, pipeline, similarity,
                                            textstats)

    docs = (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .withColumnRenamed("text", "content"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    import pyarrow.parquet as pq
    dim = len(pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")
                            ).column("embedding")[0].as_py())

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    cases = {
        "dedup_exact": lambda: noop(dedup.exact_dedup(docs)),
        "dedup_minhash_lsh": lambda: noop(dedup.minhash_lsh_pairs(
            docs, num_hashes=32, bands=16, threshold=0.01,
            hash_fn="portable")),
        "dedup_simhash": lambda: noop(dedup.simhash_pairs(
            docs, max_hamming=3, num_bits=60, hash_fn="portable")),
        "dedup_clusters": lambda: noop(dedup.dedup_clusters(
            dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=16,
                                    threshold=0.01, hash_fn="portable"))),
        "pipeline_curate": lambda: noop(pipeline.curate_corpus(
            docs, min_quality=0.3, exact_dedup=True)),
        "text_quality": lambda: noop(textstats.text_quality(docs)),
        "lang_id": lambda: noop(textstats.lang_id(docs)),
        "token_counts": lambda: noop(textstats.token_counts(docs)),
        "text_repetition": lambda: noop(textstats.repetition_stats(docs)),
        "doc_fingerprint": lambda: noop(textstats.fingerprint(docs)),
        "ann_lsh_topk": lambda: noop(similarity.lsh_bucketed_topk(
            emb, [0, 1, 2], k=10, num_planes=8, dim=dim)),
        "ann_emb_neardup": lambda: noop(similarity.embedding_neardup_pairs(
            emb, threshold=0.3, num_planes=8, num_tables=4, dim=dim)),
    }
    # warm the session (python workers, codegen) outside the timings
    noop(textstats.text_quality(docs))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    spark.sparkContext.setJobDescription(None)
    out = {}
    for name, fn in cases.items():
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        best = float("inf")
        for _ in range(reps):
            t = time.time()
            fn()
            best = min(best, time.time() - t)
        out[name] = round(best, 4)
    print(json.dumps({"metric": "operator_noop_seconds", "sf": SF_DIR,
                      "cpus": CPUS, "cases": out,
                      "value": round(sum(out.values()), 4)}))


if __name__ == "__main__":
    main()
