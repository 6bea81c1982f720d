"""Corpus source readers: every format normalizes to the canonical
document frame and feeds the engine end-to-end."""

import json
import os

import pandas as pd
import pytest

from pim_lucene_spark import IndexConfig
from pim_lucene_spark.operators.index_build import build_index
from pim_lucene_spark.operators.search import search
from pim_lucene_spark.sources import read_corpus

DOCS = pd.DataFrame({
    "doc_id": range(4),
    "lang": ["py", "py", "go", "go"],
    "text": ["red orange white", "green red", "blah youpi blah",
             "orange you glad"],
})


def _check_canonical(df, with_id=True):
    cols = df.columns
    assert cols[-1] == "content"
    if with_id:
        assert "doc_id" in cols
        assert dict(df.dtypes)["doc_id"] == "bigint"


def test_read_parquet_json_csv(spark, tmp_path):
    p = str(tmp_path / "corpus")
    spark.createDataFrame(DOCS).write.parquet(p + ".parquet")
    DOCS.to_json(p + ".json", orient="records", lines=True)
    DOCS.to_csv(p + ".csv", index=False)
    for fmt, path in [("parquet", p + ".parquet"), ("json", p + ".json"),
                      ("csv", p + ".csv")]:
        df = read_corpus(spark, path, fmt, content_col="text",
                         id_col="doc_id", meta_cols=["lang"])
        _check_canonical(df)
        got = df.toPandas().sort_values("doc_id").reset_index(drop=True)
        assert got.content.tolist() == DOCS.text.tolist(), fmt
        assert got.lang.tolist() == DOCS.lang.tolist(), fmt


def test_read_text_one_doc_per_line(spark, tmp_path):
    path = str(tmp_path / "corpus.txt")
    with open(path, "w") as f:
        f.write("\n".join(DOCS.text) + "\n")
    df = read_corpus(spark, path, "text")
    _check_canonical(df, with_id=False)
    assert sorted(r.content for r in df.collect()) == sorted(DOCS.text)


def test_read_wholetext_one_doc_per_file(spark, tmp_path):
    d = tmp_path / "files"
    d.mkdir()
    for i, t in enumerate(DOCS.text):
        (d / f"doc{i}.txt").write_text(t)
    df = read_corpus(spark, str(d), "wholetext")
    got = df.toPandas()
    assert set(got.content) == set(DOCS.text)
    assert all(p.endswith(".txt") for p in got.path)


def test_iceberg_raises_actionable_error(spark):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_corpus(spark, "db.tbl", "iceberg")


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown corpus format"):
        read_corpus(spark, "x", "orc2")


def test_text_corpus_end_to_end(spark, tmp_path, tmp_index_dir):
    """text source → auto doc ids → index → phrase search."""
    path = str(tmp_path / "corpus.txt")
    with open(path, "w") as f:
        f.write("\n".join(DOCS.text) + "\n")
    docs = read_corpus(spark, path, "text")
    m = build_index(spark, docs, tmp_index_dir,
                    IndexConfig(num_partitions=2, num_segments=1,
                                build_chunks=1))
    assert m.doc_count == 4
    res = search(spark, m, [(0, "blah youpi blah")], k=10).toPandas()
    assert len(res) == 1 and int(res.freq.iloc[0]) == 1
