"""Streaming ingestion — incremental index generations + compaction.

The reference is batch-only: each Lucene commit triggers a full PIM index
rebuild (``PimIndexWriter.doAfterCommit``, ``PimIndexWriter.java:139-144``)
and queries are answered against the loaded generation; its only streaming
machinery is the bounded query queue (``PimSystemManager.java:265-281``).
The Spark-native engine goes further, because Structured Streaming makes
the natural fit explicit:

- ``stream_index`` attaches a ``foreachBatch`` sink to any streaming
  DataFrame of documents.  Every micro-batch becomes one self-contained
  index *generation* under ``<root>/gen=<epoch>`` (same layout as a batch
  build — a Lucene "segment" in the merge sense), so ingestion never
  rewrites existing postings: append-only, crash-safe (a half-written
  generation has no manifest and is ignored).
- ``merge_generations`` compacts generations with the Lucene-style
  multi-way merge (:mod:`pim_lucene_spark.operators.merge`), exactly like
  background segment merging.
- Queries run against any generation, or against the compacted index.

Doc IDs within a generation are batch-local (dense from 0); the merge
assigns partition-preserving doc-base offsets, so global IDs are
``gen_base + local_id`` — the same arithmetic Lucene uses for per-segment
``docBase``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pim_lucene_spark.config import IndexConfig
from pim_lucene_spark.manifest import IndexManifest
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.operators.merge import merge_indexes


def _gen_dir(root: str, batch_id: int) -> str:
    return os.path.join(root, f"gen={batch_id:010d}")


def stream_index(stream_df: DataFrame, index_root: str,
                 cfg: IndexConfig = IndexConfig(),
                 content_col: str = "content",
                 id_col: str | None = None,
                 checkpoint_dir: str | None = None,
                 trigger_available_now: bool = True,
                 query_name: str = "pim_stream_index"):
    """Attach an incremental index-build sink to a streaming DataFrame.

    Returns the started ``StreamingQuery``.  With
    ``trigger_available_now`` the query drains the currently-available
    input and stops (batch-style test runs); otherwise it runs continuous
    micro-batches.
    """
    os.makedirs(index_root, exist_ok=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if len(batch_df.take(1)) == 0:
            return
        spark = batch_df.sparkSession
        build_index(spark, batch_df, _gen_dir(index_root, batch_id), cfg,
                    content_col=content_col, id_col=id_col,
                    source=f"stream-batch-{batch_id}")

    writer = (stream_df.writeStream
              .queryName(query_name)
              .foreachBatch(write_batch)
              .option("checkpointLocation",
                      checkpoint_dir or os.path.join(index_root, "_checkpoint")))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def list_generations(index_root: str) -> list[str]:
    """Complete (manifest-bearing) generations, oldest first."""
    if not os.path.isdir(index_root):
        return []
    gens = []
    for name in sorted(os.listdir(index_root)):
        d = os.path.join(index_root, name)
        if name.startswith("gen=") and \
                os.path.exists(os.path.join(d, "manifest.json")):
            m = IndexManifest.load(d)
            if len(m.completed_chunks) == m.build_chunks:
                gens.append(d)
    return gens


def _gen_identity_col(schema_names: list[str], uid_col: str,
                      gen_dir: str) -> str:
    """The column holding USER identity in a generation's docs table:
    update-built generations store it as ``src_doc_id`` when the user's
    id column collides with the internal ``doc_id``; otherwise the user
    column itself.  ``uid_col='doc_id'`` with no ``src_doc_id`` payload
    means the generation was built with the user ids AS the internal
    ids — the only case where matching on ``doc_id`` is identity.  Any
    OTHER absent uid column is an error: falling back to internal dense
    ids would silently delete arbitrary unrelated documents."""
    if uid_col == "doc_id":
        return "src_doc_id" if "src_doc_id" in schema_names else "doc_id"
    if uid_col in schema_names:
        return uid_col
    raise ValueError(
        f"generation {gen_dir} has no {uid_col!r} column — it was built "
        "without the user identity payload, so update_docs cannot match "
        "its documents (internal doc ids are NOT user ids)")


def update_docs(spark: SparkSession, index_root: str, docs: DataFrame,
                cfg: IndexConfig = IndexConfig(),
                content_col: str = "content",
                uid_col: str = "doc_id") -> IndexManifest:
    """Document update = delete + generation append — the commit/update
    lifecycle of ``TestPimIndexWriter.java:72-118`` expressed over
    immutable generations:

    1. every existing generation holding one of the incoming user ids
       gets those docs marked deleted (live-docs vector; queries against
       that generation stop returning the old version immediately);
    2. the new versions become a fresh append-only generation with
       dense internal doc ids; the user id survives as a payload column
       (``src_doc_id`` when ``uid_col`` collides with the internal id).

    ``uid_col`` is the stable USER identity column of ``docs`` (may be
    new ids — pure insert — or existing — replace).  After the next
    :func:`merge_generations` the old versions' postings are purged and
    internal ids re-base — Lucene's ephemeral-docid contract: identity
    lives in your id field, not in the internal id.

    Returns the new generation's manifest.
    """
    from pyspark.sql import functions as F

    from pim_lucene_spark.operators.deletes import write_deletes

    gens = list_generations(index_root)
    uids = docs.select(F.col(uid_col).cast("long").alias("_uid")).distinct()
    for gen_dir in gens:
        m = IndexManifest.load(gen_dir)
        gdocs = spark.read.parquet(m.docs_path)
        ident = _gen_identity_col(gdocs.columns, uid_col, gen_dir)
        hit = (gdocs.select("doc_id",
                            F.col(ident).cast("long").alias("_uid"))
               .join(uids, "_uid").select("doc_id"))
        if m.delete_gen:  # don't re-delete already-deleted ids
            prev = spark.read.parquet(m.deletes_path).select("doc_id")
            hit = hit.join(prev, "doc_id", "left_anti")
        # one evaluation of the join: update batches are small (they
        # fit the incoming docs frame), so collect the ids instead of
        # re-running the join inside write_deletes' validate/write/count
        hit_ids = [r["doc_id"] for r in hit.collect()]
        if hit_ids:
            write_deletes(spark, m, hit_ids)
    nxt = 0
    if gens:
        nxt = max(int(os.path.basename(g).split("=")[1]) for g in gens) + 1
    meta = uid_col
    if uid_col == "doc_id":
        meta = "src_doc_id"
        docs = docs.withColumnRenamed("doc_id", meta)
    return build_index(spark, docs, _gen_dir(index_root, nxt), cfg,
                       content_col=content_col, id_col=None,
                       meta_cols=[meta], source=f"update-batch-{nxt}")


def merge_generations(spark: SparkSession, index_root: str,
                      out_dir: str | None = None,
                      num_segments: int | None = None) -> IndexManifest:
    """Compact all complete generations into one index (segment merge)."""
    gens = list_generations(index_root)
    if not gens:
        raise ValueError(f"no complete generations under {index_root}")
    if len(gens) == 1:
        return IndexManifest.load(gens[0])
    return merge_indexes(spark, gens,
                         out_dir or os.path.join(index_root, "compacted"),
                         num_segments=num_segments)
