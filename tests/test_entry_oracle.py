"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on sf0.001/sf0.01 and compare
row-count + schema-shape + values against its DuckDB ``oracle_sql``."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("BDPS_TEST_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(object).map(
            lambda v: None if v is None or (isinstance(v, float) and pd.isna(v)) else str(v)
        )
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        df = fn(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    got = _canon(fn(spark, SF_DIR).toPandas())
    con = _duck(SF_DIR)
    exp = _canon(con.execute(sql).df())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "url" in df.columns
