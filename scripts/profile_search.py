#!/usr/bin/env python
"""Phase-level profile of the bench search path (guide §1: measure first).

Reproduces bench.py's setup exactly, then times each driver-side phase of
search() for the bench queries.  NOT a benchmark — a diagnosis tool.
"""
from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{CPUS}]")
             .appName("profile_search")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pim_lucene_spark import IndexConfig
    from pim_lucene_spark.operators.index_build import build_index
    from pim_lucene_spark.operators import search as S

    docs = (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .withColumnRenamed("text", "content"))
    index_dir = f"/tmp/pim_prof_index_{os.getpid()}"
    shutil.rmtree(index_dir, ignore_errors=True)
    cfg = IndexConfig(num_partitions=max(CPUS, 8), num_segments=4,
                      build_chunks=1)
    t0 = time.time()
    manifest = build_index(spark, docs, index_dir, cfg,
                           content_col="content", id_col="doc_id",
                           source=SF_DIR)
    print(f"build {time.time()-t0:.2f}s phases={manifest.metrics['phase_seconds']}")

    S.search(spark, manifest, [(0, "the")], k=10).count()  # warm

    from pyspark.sql import functions as F
    from pim_lucene_spark.functions import bm25

    QUERIES = {
        "q_term_hot": "the",
        "q_term_mid": "vector",
        "q_phrase2": "the fast",
        "q_phrase4": "table scan merge part",
        "q_phrase_miss": "merge zzzznotfound",
    }

    for name, text in QUERIES.items():
        for rep in range(2):
            queries = [(0, text)]
            k, precision = 10, "float32"
            t = {}
            tt = time.time()
            gap_offsets: dict = {}
            planned, needed_terms = S.plan_queries(
                spark, manifest, queries, k, precision,
                collect_offsets=gap_offsets)
            t["plan"] = time.time() - tt

            if not planned:
                tt = time.time()
                empty = spark.createDataFrame([], S.RESULT_SCHEMA)
                t["mk_empty"] = time.time() - tt
                tt = time.time()
                empty.collect()
                t["collect_empty"] = time.time() - tt
                print(name, rep, json.dumps({kk: round(v, 4)
                                             for kk, v in t.items()}))
                continue

            avgdl = bm25.avg_field_length(manifest.sum_total_term_freq,
                                          manifest.doc_count, precision)
            payload = {
                "queries": planned, "k": int(k), "precision": precision,
                "cache": bm25.score_cache(avgdl, manifest.k1, manifest.b,
                                          precision),
                "num_partitions": manifest.num_partitions,
                "num_segments": manifest.num_segments,
                "norms_path": manifest.norms_path,
                "cache_key": ("prof", manifest.doc_count,
                              manifest.sum_total_term_freq),
                "postings_cache_mb": 0,
                "deletes_path": None,
            }
            tt = time.time()
            postings = (spark.read.parquet(*[manifest.chunk_path(c) for c in
                                             range(manifest.build_chunks)])
                        .filter(F.col("term").isin(list(needed_terms))))
            t["read_plan"] = time.time() - tt
            tt = time.time()
            per_part = (postings.groupBy("pid")
                        .applyInPandas(S._match_kernel(payload),
                                       S.RESULT_SCHEMA))
            t["apply_plan"] = time.time() - tt
            tt = time.time()
            pdf = per_part.toPandas()
            t["job_toPandas"] = time.time() - tt
            tt = time.time()
            if len(pdf):
                pdf = (pdf.sort_values(["qid", "score", "doc_id"],
                                       ascending=[True, False, True])
                       .groupby("qid", sort=True).head(k))
            t["merge"] = time.time() - tt
            tt = time.time()
            sdf = spark.createDataFrame(pdf, S.RESULT_SCHEMA)
            t["mk_df"] = time.time() - tt
            tt = time.time()
            sdf.collect()
            t["collect"] = time.time() - tt
            print(name, rep, json.dumps({kk: round(v, 4)
                                         for kk, v in t.items()}))

    shutil.rmtree(index_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
