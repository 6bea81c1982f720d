#!/usr/bin/env python
"""spark-submit entry point: batched BM25 top-k search against an index.

    spark-submit --master local[32] --py-files /tmp/pim_lucene_spark.zip \
        scripts/search_job.py --index-dir /tmp/idx --k 10 \
        --queries-file queries.txt [--output /tmp/results_parquet]

``--queries-file``: one query phrase per line (the reference benchmark's
format, ``requests_phrase_nl.txt``); qid = line number.  Prints ONE JSON
line with batch wall-clock QPS (``SearchWikiDPUMultiThread.java:138-163``
methodology).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--queries-file", default="-",
                    help="one phrase per line; '-' = stdin")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--precision", default="float32",
                    choices=["float32", "float64"])
    ap.add_argument("--output", default="",
                    help="optional parquet output path")
    args = ap.parse_args()

    lines = (sys.stdin if args.queries_file == "-"
             else open(args.queries_file)).read().splitlines()
    queries = [(i, q.strip()) for i, q in enumerate(lines) if q.strip()]

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("pim_search").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from pim_lucene_spark.operators.search import search

    t0 = time.time()
    res = search(spark, args.index_dir, queries, k=args.k,
                 precision=args.precision)
    if args.output:
        res.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = len(res.collect())
    wall = time.time() - t0
    print(json.dumps({
        "queries": len(queries),
        "k": args.k,
        "result_rows": n,
        "wall_sec": round(wall, 3),
        "qps": round(len(queries) / wall, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
