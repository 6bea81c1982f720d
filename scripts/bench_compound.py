"""Compound-plan shape evidence: kernel vs join on stopword-clause booleans.

The round-3 plan materialized every clause's full match set through the
shuffle (``k=10**9`` clause frames + full-outer-join chains); the round-4
kernel composes per partition and shuffles only per-partition top-k.
This script measures BOTH on the sf0.1 corpus with deliberately
stopword-heavy SHOULD clauses and records:

- ``clause_frame_rows``: rows the join plan's clause evaluation puts
  through the exchange (its one batched sub-search at ``k=10**9``);
- ``kernel_shuffle_rows``: rows the kernel plan exchanges (pre-window
  per-partition frame, ≤ P·k per query);
- wall-clock for each full plan (best of REPS) and the row-reduction
  ratio (the VERDICT item-1 "done" gate is ≥10×).

Writes ``BENCH_COMPOUND.json`` at the repo root.
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (32), COMPOUND_REPS (3).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("COMPOUND_REPS", "3"))
K = 10

# stopword-heavy SHOULD clauses: "the" matches nearly every synthetic
# doc, which is exactly the clause the join plan shipped wholesale.
# COMPOUND_VOCAB=code swaps in the source-code corpus' hot keywords
# (the 500k-doc scaling corpus: "def"/"import" play the stopword role).
if os.environ.get("COMPOUND_VOCAB") == "code":
    BOOL_SPECS = [
        {"must": ["class"], "should": ["def", "self"]},
        {"must": ["while"], "should": ["def"]},
        {"should": ["def", "return", "class"]},
        {"must": ["for", "if"], "should": ["def", "import"]},
    ]
    DISMAX_SPECS = [
        {"clauses": ["def", "import return"], "tie": 0.3},
        {"clauses": ["def self", "def", "class"], "tie": 0.1},
    ]
else:
    BOOL_SPECS = [
        {"must": ["merge"], "should": ["the", "fast"]},
        {"must": ["vector"], "should": ["the"]},
        {"should": ["the", "merge", "table"]},
        {"must": ["key", "order"], "should": ["the", "data"]},
    ]
    DISMAX_SPECS = [
        {"clauses": ["the", "merge table"], "tie": 0.3},
        {"clauses": ["the fast", "the", "vector"], "tie": 0.1},
    ]


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("bench_compound")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pim_lucene_spark import IndexConfig
    from pim_lucene_spark.operators.index_build import build_index
    from pim_lucene_spark.operators.search import search
    from pim_lucene_spark.plans.boolean import BooleanQuery, search_boolean
    from pim_lucene_spark.plans.compound import _SpecBuilder, eval_compound
    from pim_lucene_spark.plans.dismax import DisMaxQuery, search_dismax

    src = os.path.join(SF_DIR, "documents.parquet")
    if not os.path.exists(src):
        src = SF_DIR  # a bare corpus parquet dir (e.g. the 500k-doc
        # scaling corpus on /dev/shm) works too
    docs = spark.read.parquet(src)
    if "text" in docs.columns:
        docs = docs.withColumnRenamed("text", "content")
    index_dir = f"/tmp/pim_compound_bench_{os.getpid()}"
    shutil.rmtree(index_dir, ignore_errors=True)
    cfg = IndexConfig(num_partitions=max(CPUS, 8), num_segments=4,
                      build_chunks=1)
    manifest = build_index(spark, docs, index_dir, cfg,
                           content_col="content", id_col="doc_id",
                           source=SF_DIR)

    bqs = [(i, BooleanQuery(**s)) for i, s in enumerate(BOOL_SPECS)]
    dqs = [(100 + i, DisMaxQuery(**s)) for i, s in enumerate(DISMAX_SPECS)]

    # --- row accounting -----------------------------------------------------
    # join plan's clause frame: ONE batched sub-search of every clause at
    # k=10**9 (what _clause_frames does)
    clause_batch, sid = [], 0
    for spec in BOOL_SPECS + [
            {"must": s["clauses"]} for s in DISMAX_SPECS]:
        for role in ("must", "should", "filter"):
            for text in spec.get(role, []):
                clause_batch.append((sid, text))
                sid += 1
    clause_rows = search(spark, manifest, clause_batch, k=10 ** 9).count()

    b = _SpecBuilder(spark, {"": manifest}, "")
    specs = [b.bool_spec(qid, q, "") for qid, q in bqs] + \
            [b.dismax_spec(qid, q, "") for qid, q in dqs]
    kernel_rows = eval_compound(spark, {"": manifest}, specs, b.leaves, K,
                                "float32", return_partial=True).count()

    # --- wall-clock ---------------------------------------------------------
    def best(fn) -> float:
        t_best = float("inf")
        for _ in range(REPS):
            t = time.time()
            fn()
            t_best = min(t_best, time.time() - t)
        return t_best

    t_kernel = best(lambda: (
        search_boolean(spark, manifest, bqs, k=K, plan="kernel").collect(),
        search_dismax(spark, manifest, dqs, k=K, plan="kernel").collect()))
    t_join = best(lambda: (
        search_boolean(spark, manifest, bqs, k=K, plan="join").collect(),
        search_dismax(spark, manifest, dqs, k=K, plan="join").collect()))

    out = {
        "sf_dir": SF_DIR,
        "docs": docs.count(),
        "k": K,
        "queries": len(bqs) + len(dqs),
        "clause_frame_rows": int(clause_rows),
        "kernel_shuffle_rows": int(kernel_rows),
        "row_reduction": round(clause_rows / max(kernel_rows, 1), 1),
        "wall_kernel_sec": round(t_kernel, 3),
        "wall_join_sec": round(t_join, 3),
        "speedup": round(t_join / t_kernel, 2),
        "reps": REPS,
        "cpus": CPUS,
    }
    shutil.rmtree(index_dir, ignore_errors=True)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_name = os.environ.get("COMPOUND_OUT", "BENCH_COMPOUND.json")
    with open(os.path.join(root, out_name), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
