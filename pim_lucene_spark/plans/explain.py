"""Score explanation — Lucene's ``IndexSearcher.explain`` for the engine.

``explain(index, query, doc_id)`` returns the full BM25 factor tree for
one (query, doc) pair, mirroring the structure Lucene prints
(``BM25Similarity.BM25Scorer.explain``): the final score, the weight
(``boost · Σ idf``), per-term idf with its df/docCount inputs, the
phrase/term frequency, the SmallFloat-quantized doc length, avgdl, and
the norm cache value — every number produced by the same float32 (or
float64) expression tree the search kernel uses, so
``explain(...)["score"]`` is bit-identical to the score the doc gets in
``search`` (pinned by tests).

The doc's frequency comes from re-tokenizing that one document's stored
text (the docs table keeps it — sha256-verified against the source), so
explain is a driver-side O(1-doc) operation: one pushdown stats read,
one docs-row read, one norms byte."""

from __future__ import annotations

import numpy as np

from pim_lucene_spark.manifest import IndexManifest


def explain(index: IndexManifest | str, query, doc_id: int,
            precision: str = "float32") -> dict:
    """BM25 factor tree for one (query, doc) — see module docstring.

    ``query`` is a query text (multi-token = phrase) or a typed
    ``PhraseQuery``/``TermQuery`` (slop=0 only).  Returns a dict with
    ``score`` 0.0 and ``matches=False`` when the doc doesn't match.
    """
    import pyarrow.parquet as pq

    from pim_lucene_spark.functions import bm25
    from pim_lucene_spark.functions.tokenize import tokenize_one
    from pim_lucene_spark.model import phrase_freq
    from pim_lucene_spark.operators.search import _local_norms

    manifest = IndexManifest.load(index) if isinstance(index, str) else index
    slop = int(getattr(query, "slop", 0))
    if slop:
        raise ValueError("explain covers exact (slop=0) queries")
    text = getattr(query, "text", query)
    boost = float(getattr(query, "boost", 1.0))
    terms = tokenize_one(text, manifest.tokenizer)
    if not terms:
        raise ValueError("empty query after analysis")

    # per-term stats (pushdown read of the stats table)
    stats = pq.read_table(manifest.stats_path,
                          filters=[("term", "in", list(set(terms)))])
    df_map = dict(zip(stats.column("term").to_pylist(),
                      stats.column("doc_freq").to_pylist()))
    doc_count = manifest.doc_count
    per_term = []
    for t in terms:
        df = int(df_map.get(t, 0))
        t_idf = float(bm25.idf(df, doc_count, precision)) if df else 0.0
        per_term.append({"term": t, "doc_freq": df, "doc_count": doc_count,
                         "idf": t_idf})

    # the doc's stored text → exact phrase/term freq (model kernel)
    doc = pq.read_table(
        manifest.docs_path,
        filters=[("doc_id", "in", [int(doc_id)])]).to_pylist()
    if not doc:
        raise ValueError(f"doc_id {doc_id} not in the index")
    tokens = tokenize_one(doc[0]["text"] if "text" in doc[0]
                          else doc[0]["content"], manifest.tokenizer)
    freq = phrase_freq(tokens, terms)

    # norm byte from the per-pid norms blob (the kernel's own source)
    P = manifest.num_partitions
    pid, rel = int(doc_id) % P, int(doc_id) // P
    ckey = ("explain", manifest.build_id or manifest.index_dir)
    norm_byte = int(_local_norms(manifest, ckey, pid)[rel])

    avgdl = bm25.avg_field_length(manifest.sum_total_term_freq,
                                  doc_count, precision)
    cache = bm25.score_cache(avgdl, manifest.k1, manifest.b, precision)
    dfs = np.array([p["doc_freq"] for p in per_term], dtype=np.int64)
    weight = bm25.phrase_weight(dfs, doc_count, boost=boost,
                                precision=precision)
    if freq > 0 and all(p["doc_freq"] for p in per_term):
        score = float(bm25.score(np.array([freq]), np.array([norm_byte]),
                                 float(weight), cache, precision)[0])
        matches = True
    else:
        score, matches = 0.0, False
    from pim_lucene_spark.functions.smallfloat import byte4_to_int
    return {
        "doc_id": int(doc_id),
        "matches": matches,
        "score": score,
        "description": (f"score = weight - weight/(1 + freq*cache), "
                        f"weight = boost * sum(idf), k1={manifest.k1}, "
                        f"b={manifest.b}"),
        "boost": boost,
        "weight": float(weight),
        "freq": int(freq),
        "per_term": per_term,
        "norm_byte": norm_byte,
        "quantized_doc_length": int(byte4_to_int(
            np.array([norm_byte], dtype=np.int64))[0]),
        "avgdl": float(avgdl),
        "cache": float(cache[norm_byte]),
        "precision": precision,
    }
