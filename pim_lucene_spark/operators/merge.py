"""Multi-way index merge — Lucene-style segment compaction (operator B6).

The reference's ``CompositeTermsEnum`` streams a k-way merge of per-segment
sorted term dictionaries into one index (``PimIndexWriter.java:249-324``);
Lucene's segment merge concatenates doc spaces with per-segment doc-base
offsets.  The Spark-native re-expression merges whole *indexes* built over
disjoint document batches (incremental indexing):

- Each source index ``s`` gets a doc-base offset ``base_s`` — the previous
  bases plus the previous source's **doc-id span** (max doc_id + 1,
  ``IndexManifest.span``) rounded up to a multiple of the partition count
  so that ``(doc + base_s) % P == doc % P``: a doc never changes partition,
  which makes the merge embarrassingly parallel per partition (no doc
  re-routing shuffle, only a ``groupBy(pid)`` co-location of the sources'
  posting rows).  Using the span (not ``doc_count``) keeps re-merges of
  already-merged indexes correct: a merged id space contains round-up gaps,
  so ``max doc_id + 1 > doc_count``.
- Within a partition, every source's relative docIDs shift by the constant
  ``base_s / P``; posting lists merge **at the posting level**: each
  source row's compressed streams are decoded to (doc, freq, positions)
  arrays, doc ids shifted, and the rows concatenated in (term, source,
  stripe) order — already globally (term, doc, pos)-sorted because bases
  ascend and each source row is doc-ordered.  No token-level Python
  objects are ever materialized (term identity travels as an int64 code);
  peak memory is 3 int64 arrays over the token stream, the same profile
  as the build kernel.
- Norms blobs are placed at their shifted offsets in a merged dense blob
  (gaps from the round-up are zero padding; those docIDs simply never
  appear in any posting list).  Blob placement uses actual blob lengths,
  which for a merged source exceed its ``num_docs`` (padding).

At 100 TB scale this is the compaction path for incremental builds: cost
is one co-partitioned shuffle of compressed posting rows (no
re-tokenization of content), the same way Lucene merges avoid re-analysis.
"""

from __future__ import annotations

import os
import time
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pim_lucene_spark.functions.postings import decode_columnar
from pim_lucene_spark.manifest import IndexManifest
from pim_lucene_spark.operators.index_build import (
    NORMS_SCHEMA,
    POSTINGS_SCHEMA,
    encode_partition_postings,
)


def _load(m: IndexManifest | str) -> IndexManifest:
    return IndexManifest.load(m) if isinstance(m, str) else m


def _merge_postings_kernel(rel_shifts: list[int], num_partitions: int,
                           num_segments: int, nb_doc_per_segment: int,
                           stripe_cap: int,
                           del_paths: list[str | None] | None = None,
                           del_spans: list[int] | None = None):
    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        if len(pdf) == 0:
            return pd.DataFrame(columns=[f.name for f in POSTINGS_SCHEMA.fields])
        # per-source live masks: a merge PURGES deleted docs (Lucene's
        # merge-reclaims-deletes) by dropping their postings at the
        # decoded level before re-encode
        live_src: dict[int, np.ndarray | None] = {}

        def get_live(src: int):
            if src not in live_src:
                path = del_paths[src] if del_paths else None
                if path is None:
                    live_src[src] = None
                else:
                    from pim_lucene_spark.operators.deletes import (
                        live_mask_for,
                    )
                    live_src[src] = live_mask_for(
                        path, pid, num_partitions, del_spans[src])
            return live_src[src]

        # factorize terms once at the ROW level: per-token term identity is
        # an int64 code, never a Python string (rows ≪ tokens)
        row_codes, uniques = pd.factorize(pdf["term"], sort=True)
        srcs = pdf["src"].to_numpy(np.int64)
        stripes = pdf["stripe"].to_numpy(np.int64)
        # (code, src, stripe) order ⇒ concatenated streams are globally
        # (term, doc, pos)-sorted: bases ascend across sources and each
        # source row is doc-ordered with ascending stripes
        order = np.lexsort((stripes, srcs, row_codes))
        pdf = pdf.iloc[order]
        row_codes = row_codes[order]

        code_parts, doc_parts, pos_parts = [], [], []
        for code, row in zip(row_codes, pdf.itertuples(index=False)):
            tp = decode_columnar(row.doc_blob, row.freq_blob, row.pos_blob,
                                 np.asarray(row.seg_doc_counts),
                                 decode_positions=True)
            rel, freqs, pos = tp.rel_docs, tp.freqs, tp.positions
            lv = get_live(int(row.src))
            if lv is not None:
                keep = lv[rel]
                if not keep.all():
                    pos = pos[np.repeat(keep, freqs)]
                    rel, freqs = rel[keep], freqs[keep]
                    if rel.size == 0:
                        continue
            abs_doc = (rel + rel_shifts[row.src]) * num_partitions + pid
            tok_doc = np.repeat(abs_doc, freqs)
            code_parts.append(np.full(tok_doc.size, code, dtype=np.int64))
            doc_parts.append(tok_doc)
            pos_parts.append(pos)
        if not code_parts:
            return pd.DataFrame(columns=[f.name for f in
                                         POSTINGS_SCHEMA.fields])
        codes = np.concatenate(code_parts)
        tok_doc = np.concatenate(doc_parts)
        tok_pos = np.concatenate(pos_parts)
        return encode_partition_postings(
            pid, codes, tok_doc, tok_pos,
            np.asarray(uniques, dtype=object), num_partitions, num_segments,
            nb_doc_per_segment, stripe_cap)

    return fn


def _merge_norms_kernel(rel_shifts: list[int]):
    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        placed, total, size = [], 0, 0
        for row in pdf.itertuples(index=False):
            blob = np.frombuffer(row.norms, dtype=np.uint8)
            off = rel_shifts[row.src]
            placed.append((off, blob))
            total += int(row.num_docs)
            size = max(size, off + blob.size)
        out = np.zeros(size, dtype=np.uint8)
        for off, blob in placed:
            out[off:off + blob.size] = blob
        return pd.DataFrame({"pid": [pid], "num_docs": [total],
                             "norms": [out.tobytes()]})

    return fn


def merge_indexes(spark: SparkSession, sources: list,
                  out_dir: str, num_segments: int | None = None,
                  ) -> IndexManifest:
    """Merge indexes built over disjoint doc batches into one index.

    Sources must share ``num_partitions``, tokenizer and BM25 constants.
    Sources may themselves be merged indexes (incremental compaction
    chains): doc-base offsets are computed from each source's padded
    doc-id span.  Returns the manifest of the merged index.
    """
    ms = [_load(s) for s in sources]
    if len(ms) < 2:
        raise ValueError("need at least two source indexes")
    P = ms[0].num_partitions
    for m in ms[1:]:
        if (m.num_partitions, m.tokenizer, m.k1, m.b) != \
                (P, ms[0].tokenizer, ms[0].k1, ms[0].b):
            raise ValueError("sources disagree on partitions/tokenizer/BM25")

    t0 = time.time()
    # doc-base offsets from the padded SPAN, rounded up to multiples of P
    # (partition-preserving; span != doc_count for already-merged sources)
    bases, acc = [], 0
    for m in ms:
        bases.append(acc)
        acc += -(-m.span // P) * P
    span = bases[-1] + ms[-1].span
    rel_shifts = [b // P for b in bases]
    segs = num_segments or max(m.num_segments for m in ms)
    nb_doc_per_segment = -(-span // segs)
    doc_count = sum(m.doc_count for m in ms)
    sum_ttf = sum(m.sum_total_term_freq for m in ms)
    stripe_cap = min(getattr(m, "max_postings_per_stripe", 1 << 17)
                     for m in ms)

    os.makedirs(out_dir, exist_ok=True)
    manifest = IndexManifest(
        index_dir=out_dir, num_partitions=P, num_segments=segs,
        doc_count=doc_count, sum_total_term_freq=sum_ttf,
        nb_doc_per_segment=nb_doc_per_segment, tokenizer=ms[0].tokenizer,
        k1=ms[0].k1, b=ms[0].b, build_chunks=1, completed_chunks=[0],
        source=" + ".join(m.index_dir for m in ms), content_col="content",
        max_postings_per_stripe=stripe_cap,
        doc_span=span, build_id=uuid.uuid4().hex,
    )

    from pim_lucene_spark.functions import bm25
    from pim_lucene_spark.functions.smallfloat import quantize_norm_inverse
    avgdl32 = bm25.avg_field_length(sum_ttf, doc_count, "float32")
    qf, _ = quantize_norm_inverse(bm25.score_cache(avgdl32, ms[0].k1, ms[0].b))
    manifest.norm_quant_factor = int(qf)

    # --- docs: union with shifted ids; a merge PURGES deleted docs ---------
    any_del = any(m.delete_gen for m in ms)
    docs = None
    for m, base in zip(ms, bases):
        d = spark.read.parquet(m.docs_path)
        if m.delete_gen:
            from pim_lucene_spark.operators.deletes import deleted_ids
            d = d.join(deleted_ids(spark, m), "doc_id", "left_anti")
        d = d.withColumn("doc_id", F.col("doc_id") + F.lit(base))
        # allowMissingColumns: sources may differ in payload meta columns
        # (e.g. update generations carry src_doc_id)
        docs = d if docs is None else docs.unionByName(
            d, allowMissingColumns=True)
    docs.write.mode("overwrite").parquet(manifest.docs_path)

    # --- postings: per-partition multi-way merge (deletes dropped at the
    # decoded posting level; stats recomputed below) ------------------------
    postings = None
    for i, m in enumerate(ms):
        p = (spark.read.parquet(*[m.chunk_path(c)
                                  for c in range(m.build_chunks)])
             .withColumn("src", F.lit(i)))
        postings = p if postings is None else postings.unionByName(p)
    kernel = _merge_postings_kernel(
        rel_shifts, P, segs, nb_doc_per_segment, stripe_cap,
        del_paths=[m.deletes_path if m.delete_gen else None for m in ms],
        del_spans=[-(-m.span // P) for m in ms])
    (postings.groupBy("pid").applyInPandas(kernel, POSTINGS_SCHEMA)
     .write.mode("overwrite").parquet(manifest.chunk_path(0)))

    # --- norms: shifted dense blobs, laid out per-pid for direct reads ------
    norms = None
    for i, m in enumerate(ms):
        nm = (spark.read.parquet(m.norms_path)
              .select(F.col("pid").cast("int").alias("pid"), "num_docs",
                      "norms")
              .withColumn("src", F.lit(i)))
        norms = nm if norms is None else norms.unionByName(nm)
    (norms.groupBy("pid").applyInPandas(_merge_norms_kernel(rel_shifts),
                                        NORMS_SCHEMA)
     .write.mode("overwrite").partitionBy("pid").parquet(manifest.norms_path))

    # --- term stats: re-aggregate over merged postings ----------------------
    merged = spark.read.parquet(manifest.chunk_path(0))
    (merged.groupBy("term")
     .agg(F.sum("df").alias("doc_freq"), F.sum("ttf").alias("total_tf"))
     .write.mode("overwrite").parquet(manifest.stats_path))

    if any_del:
        # purged merge: collection stats shrink to the live corpus (the
        # moment Lucene's deleted-doc statistics catch up is the merge)
        doc_count = spark.read.parquet(manifest.docs_path).count()
        if doc_count == 0:
            raise ValueError(
                "merge produced an empty index: every source document "
                "is deleted — nothing to compact")
        sum_ttf = int(merged.agg(F.sum("ttf")).collect()[0][0] or 0)
        manifest.doc_count, manifest.sum_total_term_freq = \
            int(doc_count), sum_ttf
        avgdl32 = bm25.avg_field_length(sum_ttf, doc_count, "float32")
        qf, _ = quantize_norm_inverse(
            bm25.score_cache(avgdl32, ms[0].k1, ms[0].b))
        manifest.norm_quant_factor = int(qf)

    metrics_rows = (merged.groupBy("pid").agg(
        F.count_distinct("term").alias("terms"),
        F.sum("df").alias("postings"),
        F.sum("ttf").alias("tokens"),
        (F.sum(F.length("doc_blob")) + F.sum(F.length("freq_blob"))
         + F.sum(F.length("pos_blob"))).alias("bytes"),
    ).collect())
    manifest.metrics = {
        "merge_seconds": round(time.time() - t0, 3),
        "doc_count": manifest.doc_count,
        "sources": [m.index_dir for m in ms],
        "doc_bases": bases,
        "per_partition": {
            int(r["pid"]): {
                "terms": int(r["terms"]),
                "postings": int(r["postings"]),
                "tokens": int(r["tokens"]),
                "bytes_compressed": int(r["bytes"]),
            } for r in metrics_rows
        },
    }
    manifest.save()
    return manifest
