"""Driver-contract conformance: every queries() entry with an oracle_sql()
runs on Spark and DuckDB over the same parquet and must match on row
count, column names, and exact values (the same comparison the round
driver performs at sf0.01 — run here at sf0.001 so mismatches surface
before the driver does)."""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

ORACLE = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (dt.datetime, pd.Timestamp)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float):
        return round(v, 9)
    try:
        import numpy as np

        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return round(float(v), 9)
    except ImportError:
        pass
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, name: str) -> None:
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    duck_df = _duck(ORACLE[name])
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} != {sorted(duck_df.columns)}"
    )
    got = _normalize(spark_df)
    want = _normalize(duck_df)
    assert len(got) == len(want), f"{name}: {len(got)} rows vs {len(want)}"
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, f"{name}: first mismatches {mism[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, name: str) -> None:
    df = QUERIES[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    df.limit(5).collect()


def test_entry_smoke(spark) -> None:
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"repo", "vitality"}
    assert all(0.0 <= r["vitality"] <= 100.0 for r in rows)
