"""Serving-path scaling: sharded-server QPS at 1/2/4/8 workers.

The north rule's two-cluster-size criterion applied to the QUERY side:
the same wiki query stream (reference corpus + 1036-phrase set, the
`SearchWikiDPUMultiThread` protocol) served by the resident sharded
server at increasing worker counts, on the same index, same machine.
Reports QPS per level and the N→4N scaling efficiency for both
placements (replica = whole-batch round-robin; shard = pid-subset +
host merge).

Requires the wiki index built by ``scripts/bench_wiki.py`` (falls back
to building it).  Writes ``BENCH_SERVING.json`` at the repo root.

Env: WIKI_SERVE_LEVELS (default "1,2,4,8"), WIKI_SERVE_BATCH (64),
WIKI_SERVE_REPS (3, best-of).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_wiki import INDEX_DIR, load_queries  # noqa: E402

LEVELS = [int(x) for x in
          os.environ.get("WIKI_SERVE_LEVELS", "1,2,4,8").split(",")]
BSZ = int(os.environ.get("WIKI_SERVE_BATCH", "64"))
REPS = int(os.environ.get("WIKI_SERVE_REPS", "3"))


def _ensure_index() -> str:
    if not os.path.isdir(INDEX_DIR):
        import scripts.bench_wiki as bw
        bw.main()
    return INDEX_DIR


def _code_corpus_500k() -> tuple[str, list[tuple[int, str]]]:
    """Build (once) a 500k-doc index over the deterministic source-code
    corpus and return it with the scaling bench's 200-query batch —
    serving scaling on a corpus ~20x the wiki subset."""
    import bench_scaling as bs
    from pyspark.sql import SparkSession

    from pim_lucene_spark import IndexConfig
    from pim_lucene_spark.manifest import IndexManifest
    from pim_lucene_spark.operators.index_build import build_index

    idx = f"{bs.WORK}/idx_serving_{bs.NUM_DOCS}"
    if not os.path.isdir(idx):
        bs._gen_corpus()
        spark = (SparkSession.builder.master("local[8]")
                 .config("spark.sql.shuffle.partitions", "32")
                 .config("spark.driver.memory", "24g")
                 .config("spark.ui.enabled", "false").getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        docs = spark.read.parquet(bs.CORPUS)
        build_index(spark, docs, idx, IndexConfig(8, 8, build_chunks=1),
                    content_col="content", id_col="doc_id")
        spark.stop()
    IndexManifest.load(idx)  # fail loudly if half-built
    bs._write_queries()
    with open(bs.QUERY_FILE, encoding="utf-8") as fh:
        qs = [(i, ln.strip()) for i, ln in enumerate(fh) if ln.strip()]
    return idx, qs


def main() -> None:
    from pim_lucene_spark.serving import ShardedServer

    if os.environ.get("SERVE_CORPUS") == "code500k":
        index_dir, queries = _code_corpus_500k()
        out_name, src = "BENCH_SERVING_500K.json", "code-500k"
    else:
        index_dir = _ensure_index()
        queries = load_queries()
        out_name, src = "BENCH_SERVING.json", "wiki"
    batches = [queries[i:i + BSZ] for i in range(0, len(queries), BSZ)]
    out: dict = {
        "metric": "sharded_serving_scaling",
        "corpus": src,
        "n_queries": len(queries),
        "protocol": (f"{src} query stream, batch={BSZ}, "
                     f"best of {REPS} reps per level, workers forked on "
                     "the same index"),
        "levels": {},
    }
    for mode in ("replica", "shard"):
        per_level = {}
        for w in LEVELS:
            best = float("inf")
            with ShardedServer(index_dir, num_workers=w, mode=mode) as srv:
                srv.map(batches[: max(2, w)], k=10)  # warm every worker
                for _ in range(REPS):
                    t0 = time.time()
                    srv.map(batches, k=10)
                    best = min(best, time.time() - t0)
            per_level[str(w)] = round(len(queries) / best, 2)
        out["levels"][mode] = per_level
        lo, hi = str(min(LEVELS)), str(max(LEVELS))
        ratio = max(LEVELS) / min(LEVELS)
        out[f"{mode}_scaling_eff_{lo}_to_{hi}"] = round(
            per_level[hi] / per_level[lo] / ratio, 3)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, out_name), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
