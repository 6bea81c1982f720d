#!/usr/bin/env python
"""spark-submit entry point: build the inverted index over a corpus table.

Usage (the ``--py-files`` deployment path of the north rule):

    zip -r /tmp/pim_lucene_spark.zip pim_lucene_spark
    spark-submit --master local[32] --py-files /tmp/pim_lucene_spark.zip \
        scripts/index_job.py --input /path/to/corpus_parquet \
        --index-dir /tmp/idx --partitions 64 --segments 8

``--input synthetic:N`` generates the deterministic source-code corpus
(``pim_lucene_spark.corpus``) inline instead of reading parquet.

Prints ONE JSON line with build metrics (docs, seconds, docs/sec and the
per-partition ENABLE_STATS set from the manifest).
"""

from __future__ import annotations

import argparse
import json
import shutil
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet dir, or synthetic:<num_docs>")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--chunks", type=int, default=1)
    ap.add_argument("--content-col", default="content")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--fresh", action="store_true",
                    help="delete index dir first")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("pim_index_build").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from pim_lucene_spark import IndexConfig
    from pim_lucene_spark.operators.index_build import build_index

    if args.input.startswith("synthetic:"):
        from pim_lucene_spark.corpus import generate_corpus
        df = generate_corpus(spark, int(args.input.split(":", 1)[1]))
    else:
        df = spark.read.parquet(args.input)

    if args.fresh:
        shutil.rmtree(args.index_dir, ignore_errors=True)

    cfg = IndexConfig(num_partitions=args.partitions,
                      num_segments=args.segments,
                      build_chunks=args.chunks)
    t0 = time.time()
    manifest = build_index(spark, df, args.index_dir, cfg,
                           content_col=args.content_col,
                           id_col=args.id_col if args.id_col else None,
                           resume=args.resume, source=args.input)
    build_sec = time.time() - t0
    print(json.dumps({
        "phases": manifest.metrics.get("phase_seconds", {}),
        "docs": manifest.doc_count,
        "tokens": manifest.sum_total_term_freq,
        "build_sec": round(build_sec, 3),
        "docs_per_sec": round(manifest.doc_count / build_sec, 1),
        "tokens_per_sec": round(manifest.sum_total_term_freq / build_sec, 1),
        "partitions": manifest.num_partitions,
        "index_dir": manifest.index_dir,
        "bytes_compressed": sum(
            p["bytes_compressed"]
            for p in manifest.metrics["per_partition"].values()),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
