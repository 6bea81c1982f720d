"""End-to-end test of the __spark_entry__ driver contract at sf0.001:
every oracle-checked query must value-match DuckDB on the same parquet.
"""

import os

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
# data-dependent oracles (IVF centroid training) must read the SAME sf
# dir this test queries — each sf is an independent sample
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"qid", "doc_id", "freq", "score"}


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, con, name):
    sdf = entrymod.queries()[name](spark, SF).toPandas()
    odf = con.execute(entrymod.oracle_sql()[name]).fetchdf()
    a, b = canon(sdf), canon(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    for c in a.columns:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            np.testing.assert_allclose(a[c].astype(float), b[c].astype(float),
                                       atol=1e-9, err_msg=f"{name}.{c}")
        else:
            assert (a[c].astype(str) == b[c].astype(str)).all(), f"{name}.{c}"


def test_rows_only_queries_run(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in set(qs) - set(oracles):
        n = qs[name](spark, SF).count()
        assert n >= 0, name
