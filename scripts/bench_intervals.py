"""Interval-query scale evidence: the proximity family at 500k docs.

IntervalQuery ("A within N words of B, ordered") is a round-6 kernel
clause over the stored position streams.  This script measures the
kernel wall time for an ordered-near batch at corpus scale, compares
against the closest pre-existing surfaces (sloppy phrase — the only
proximity the engine had before — and the exact phrase), and checks
the kernel result against the DuckDB minimal-interval oracle on a
sampled partition of the corpus.

Writes ``BENCH_INTERVALS.json``.  Run QUIET.  Env: IV_DOCS (500000),
SPARK_GRAFT_CPUS (8), IV_REPS (2).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/dev/shm/pim_bench" if os.path.isdir("/dev/shm") else "/tmp/pim_bench"
N_DOCS = int(os.environ.get("IV_DOCS", "500000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
REPS = int(os.environ.get("IV_REPS", "2"))
K = 10


def main() -> None:
    import duckdb
    import numpy as np
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("bench_intervals")
             .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pim_lucene_spark import IndexConfig
    from pim_lucene_spark.corpus import generate_corpus
    from pim_lucene_spark.manifest import IndexManifest
    from pim_lucene_spark.operators.index_build import build_index
    from pim_lucene_spark.operators.search import search
    from pim_lucene_spark.oracle import intervals_sql
    from pim_lucene_spark.plans.boolean import BooleanQuery, search_boolean
    from pim_lucene_spark.plans.compound import search_sloppy_kernel
    from pim_lucene_spark.plans.query import IntervalQuery

    corpus_dir = f"{WORK}/corpus_{N_DOCS}"
    if not os.path.exists(corpus_dir):
        generate_corpus(spark, N_DOCS, num_partitions=max(CPUS, 8)) \
            .write.mode("overwrite").parquet(corpus_dir)
    docs = spark.read.parquet(corpus_dir)

    index_dir = f"{WORK}/idx_sloppy_{N_DOCS}"  # shared with bench_sloppy
    if os.path.exists(os.path.join(index_dir, "manifest.json")):
        manifest = IndexManifest.load(index_dir)
    else:
        shutil.rmtree(index_dir, ignore_errors=True)
        cfg = IndexConfig(num_partitions=max(CPUS, 8), num_segments=4,
                          build_chunks=1)
        manifest = build_index(spark, docs, index_dir, cfg,
                               content_col="content", id_col="doc_id",
                               source=corpus_dir)

    # ordered/unordered near queries over code-corpus vocab, incl. a
    # hot-term pair and an OR slot
    ivq = [
        (0, IntervalQuery("def self", max_gaps=3)),
        (1, IntervalQuery("class return", max_gaps=5)),
        (2, IntervalQuery("import os", ordered=False, max_gaps=2)),
        (3, IntervalQuery(sources=("for", ("if", "while")), max_gaps=4)),
        (4, IntervalQuery("def return self")),
    ]
    batch = [(qid, BooleanQuery(must=[q])) for qid, q in ivq]

    def best(fn) -> float:
        t_best = float("inf")
        for _ in range(REPS):
            t = time.time()
            fn()
            t_best = min(t_best, time.time() - t)
        return t_best

    rows = search_boolean(spark, manifest, batch, k=K,
                          precision="float64").toPandas()
    t_iv = best(lambda: search_boolean(spark, manifest, batch,
                                       k=K).collect())
    # nearest pre-existing proximity surface: the sloppy kernel (same
    # terms, comparable slop)
    slq = [(0, "def self"), (1, "class return"), (2, "import os"),
           (4, "def return self")]
    slops = {0: 3, 1: 5, 2: 2, 4: 0}
    t_sloppy = best(lambda: search_sloppy_kernel(
        spark, manifest, slq, k=K, slop=slops).collect())
    t_phrase = best(lambda: search(
        spark, manifest, [(0, "def self"), (1, "class return")],
        k=K).collect())

    # correctness spot-check: replay the batch on pid-0's docs in DuckDB
    sample = (spark.read.parquet(manifest.docs_path)
              .filter("doc_id % 16 = 0").toPandas())
    col = "text" if "text" in sample.columns else "content"
    con = duckdb.connect()
    con.register("docs_raw", sample.rename(columns={col: "text"}))
    con.execute("CREATE VIEW documents AS SELECT doc_id, text "
                "FROM docs_raw")
    ora = con.execute(intervals_sql(ivq, k=None)).fetchdf()
    sub = search_boolean(
        spark, manifest, batch, k=None,
        precision="float64").filter("doc_id % 16 = 0").toPandas()
    a = sub.sort_values(["qid", "doc_id"]).reset_index(drop=True)
    b = ora.sort_values(["qid", "doc_id"]).reset_index(drop=True)
    mism = -1
    if len(a) == len(b):
        # engine side here is UNROUNDED float64 while the oracle rounds
        # to 6 decimals; |x - round6(x)| <= 5e-7 by construction, so a
        # 6e-7 tolerance is the exact rounding envelope (the contract
        # entries round BOTH sides and compare exactly)
        mism = int((~np.isclose(a.score.to_numpy(), b.score.to_numpy(),
                                rtol=0, atol=6e-7)).sum()
                   + (a.doc_id.to_numpy() != b.doc_id.to_numpy()).sum())

    out = {
        "metric": "interval_query_500k",
        "n_docs": N_DOCS,
        "n_queries": len(ivq),
        "rows": int(len(rows)),
        "wall_intervals_sec": round(t_iv, 3),
        "wall_sloppy_kernel_sec": round(t_sloppy, 3),
        "wall_exact_phrase_sec": round(t_phrase, 3),
        "oracle_sampled_rows": int(len(a)),
        "oracle_mismatches": mism,
        "cpus": CPUS,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_INTERVALS.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
