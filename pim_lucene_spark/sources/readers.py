"""Corpus readers — every input lands in the one canonical shape.

The reference's only source is a directory of text files fed to
``IndexWriter`` (benchmark driver ``IndexRAMDPU.java``); a Spark engine
should ingest whatever the lake holds.  :func:`read_corpus` normalizes all
supported formats to::

    doc_id: long | absent   content: string   <passthrough meta columns>

so ``build_index`` / ``MultiFieldIndex.build`` / the dedup and textstats
operators run unchanged on any of them.  When the source has no stable id
column, leave ``id_col=None`` and let ``build_index`` assign dense
deterministic ids (``assign_doc_ids``).

Formats:

- ``parquet`` / ``json`` (JSON-lines) / ``csv`` (with header): columnar or
  semi-structured tables; ``content_col`` names the text column.
- ``text``: one document per LINE (the classic corpus-file shape, e.g.
  the reference's query/requests files); emits ``content`` only.
- ``wholetext``: one document per FILE (the reference benchmark's
  wiki-article files); emits ``content`` + ``path`` meta.
- ``iceberg``: ``spark.read.format("iceberg").load(table)`` — the lake
  path; requires the Iceberg runtime on the classpath and raises a clear
  error when absent (this sandbox has none).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_FORMATS = ("parquet", "json", "csv", "text", "wholetext", "iceberg")


def read_corpus(spark: SparkSession, path: str, format: str = "parquet",
                content_col: str = "content",
                id_col: str | None = None,
                meta_cols: list[str] | None = None,
                **options) -> DataFrame:
    """Read ``path`` in ``format`` → canonical document frame.

    Returns columns ``[doc_id?] + [meta_cols...] + [content]``; ``doc_id``
    is present iff ``id_col`` was given (cast to long).  Extra reader
    options pass through (e.g. ``multiLine`` for json, ``sep`` for csv,
    ``recursiveFileLookup`` for text trees).
    """
    fmt = format.lower()
    if fmt not in CORPUS_FORMATS:
        raise ValueError(f"unknown corpus format {format!r}; "
                         f"supported: {CORPUS_FORMATS}")

    if fmt == "text":
        df = spark.read.options(**options).text(path)
        src_content = "value"
        meta_cols = meta_cols or []
    elif fmt == "wholetext":
        df = (spark.read.options(**options)
              .option("wholetext", "true").text(path)
              .withColumn("path", F.input_file_name()))
        src_content = "value"
        meta_cols = list(meta_cols or []) + ["path"]
    elif fmt == "iceberg":
        try:
            df = spark.read.options(**options).format("iceberg").load(path)
        except Exception as exc:  # jar/catalog missing → actionable error
            raise RuntimeError(
                "iceberg source requires the iceberg-spark-runtime jar and "
                "a configured catalog (spark.sql.catalog.*); not available "
                f"in this session: {exc}") from exc
        src_content = content_col
        meta_cols = meta_cols or []
    else:
        reader = spark.read.options(**options)
        if fmt == "csv":
            reader = reader.option("header", options.get("header", "true"))
        df = getattr(reader, fmt)(path)
        src_content = content_col
        meta_cols = meta_cols or []

    cols = []
    if id_col is not None:
        df = df.withColumn("doc_id", F.col(id_col).cast("long"))
        cols.append("doc_id")
    cols += [c for c in meta_cols if c != src_content]
    out = df.select(*cols, F.col(src_content).cast("string")
                    .alias("content"))
    return out
