"""Document delete vectors — the live-docs lifecycle (Lucene semantics).

The reference writes full postings and leaves query-time live-docs
filtering as an explicit TODO (``PimIndexWriter.java:186-187``; the
commit/update lifecycle it must serve is ``TestPimIndexWriter.java:
72-118``).  This module implements that contract the way Lucene itself
does:

- ``delete_docs`` marks global doc ids deleted by writing a NEW
  delete-vector generation (``deletes/gen=<g>/`` — a Parquet of the
  FULL deleted id set, partitioned by pid) and bumping
  ``manifest.delete_gen``.  Postings, norms and term stats are
  untouched: docFreq/avgdl keep counting deleted docs until a merge,
  exactly as Lucene scores against pre-merge segment stats.
- every match kernel (distributed search, serving path, compound
  composition, BM25F, multiterm decode, scan fallback) masks candidates
  against the per-pid live bitmap before top-k accumulation — a deleted
  doc can neither appear in results nor occupy a WAND bound.
- ``merge_indexes`` PURGES: deleted docs' postings/doc rows are dropped
  at the posting level during the merge and collection stats are
  recomputed, so the merged index is deletion-free (Lucene's
  merge-reclaims-deletes).

Scale shape: the delete vector shuffles nothing at query time — each
kernel task reads only its own pid's id list (Parquet partition
pruning) and builds a boolean mask in O(deleted-in-pid).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pim_lucene_spark.manifest import IndexManifest


def write_deletes(spark: SparkSession, manifest: IndexManifest,
                  doc_ids) -> IndexManifest:
    """Mark ``doc_ids`` (iterable of ints or a DataFrame with a
    ``doc_id`` column) deleted; returns the updated (saved) manifest.

    Ids already deleted are idempotent; unknown ids (out of the doc-id
    span) are rejected.  Single-writer: concurrent ``write_deletes``
    calls on one index are not supported (Lucene requires one
    ``IndexWriter`` too).
    """
    if isinstance(doc_ids, DataFrame):
        ids = doc_ids.select(F.col("doc_id").cast("long")).distinct()
    else:
        ids = spark.createDataFrame(
            [(int(i),) for i in doc_ids], "doc_id long").distinct()
    bad = ids.filter((F.col("doc_id") < 0)
                     | (F.col("doc_id") >= manifest.span)).count()
    if bad:
        raise ValueError(f"{bad} doc ids outside the index span "
                         f"[0, {manifest.span})")
    if manifest.delete_gen:
        ids = ids.unionByName(
            spark.read.parquet(manifest.deletes_path).select("doc_id")
        ).distinct()
    new_gen = manifest.delete_gen + 1
    out = os.path.join(manifest.index_dir, "deletes", f"gen={new_gen}")
    P = manifest.num_partitions
    (ids.withColumn("pid", (F.col("doc_id") % P).cast("int"))
     .repartition("pid")
     .write.mode("overwrite").partitionBy("pid").parquet(out))
    total = spark.read.parquet(out).count()
    # deleting EVERY doc is legitimate (Lucene IndexWriter.deleteAll;
    # update_docs replacing a whole generation): searches over a fully
    # deleted index simply return nothing, and the next merge drops it
    manifest.delete_gen = new_gen
    manifest.deleted_count = int(total)
    manifest.save()
    return manifest


def deleted_ids(spark: SparkSession, manifest: IndexManifest) -> DataFrame:
    """The deleted global doc ids (empty frame when none)."""
    if not manifest.delete_gen:
        from pim_lucene_spark.sparkutil import local_empty
        from pyspark.sql import types as T
        return local_empty(spark, T.StructType(
            [T.StructField("doc_id", T.LongType())]))
    return spark.read.parquet(manifest.deletes_path).select("doc_id")


def live_mask_for(deletes_path: str | None, pid: int, P: int,
                  n_docs: int) -> np.ndarray | None:
    """Per-pid live bitmap for a kernel task: ``live[rel_doc]`` is False
    for deleted docs.  Reads ONLY this pid's id list (directory-pruned,
    O(deleted-in-pid)); returns None when there is nothing to mask (the
    common case — the kernels then skip masking entirely)."""
    if deletes_path is None:
        return None
    import pyarrow.parquet as pq
    part = os.path.join(deletes_path, f"pid={pid}")
    if not os.path.isdir(part):
        if not os.path.isdir(deletes_path):
            raise FileNotFoundError(
                f"delete vector {deletes_path} not visible from this "
                "executor; deletes need the same POSIX-visible mount as "
                "the norms layout")
        return None
    gids = np.asarray(pq.read_table(part, columns=["doc_id"])
                      .column("doc_id"), dtype=np.int64)
    if gids.size == 0:
        return None
    live = np.ones(n_docs, dtype=bool)
    live[gids // P] = False
    return live
