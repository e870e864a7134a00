"""Shared Spark-vs-DuckDB comparison harness.

Mirrors the driver's correctness gate: row count + column names + order-
insensitive value comparison, with columns sorted by name. Values must
match EXACTLY after each query's own rounding — any drift that would break
the driver's value-hash breaks these tests first.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(sql).df()


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(round(v, 9))
    if isinstance(v, pd.Timestamp):
        # DuckDB's .df() returns DATE columns as midnight Timestamps while
        # Spark returns datetime.date — collapse midnight to date-only so
        # both spell identically (true midnight timestamps collapse on both
        # sides, so the comparison stays sound).
        if v.hour == v.minute == v.second == v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat()
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    # Per-COLUMN iteration, never per-row: df.iterrows() upcasts every row
    # to a common dtype, so one float64 column silently floatifies the int
    # columns and renders 945405 as 945405.0 on BOTH sides — hiding exactly
    # the int-vs-float drift the driver's value hash fails on (the r10 q178
    # HUGEINT incident). Column-wise access preserves each cell's own type,
    # so the canonical strings are dtype-honest like the driver's.
    cols = sorted(df.columns)
    columns = [[_canon_cell(v) for v in df[c]] for c in cols]
    out = [tuple(t) for t in zip(*columns)]
    out.sort()
    return out


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    got = spark_df.toPandas()
    assert sorted(got.columns) == sorted(
        oracle_pdf.columns
    ), f"{name}: column mismatch {sorted(got.columns)} vs {sorted(oracle_pdf.columns)}"
    assert len(got) == len(
        oracle_pdf
    ), f"{name}: row count {len(got)} vs {len(oracle_pdf)}"
    a = canonicalize(got)
    b = canonicalize(oracle_pdf)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(a)} rows differ; first 5: "
        f"{mismatches[:5]}"
    )
