"""Projection / filter / predicate operators (SURVEY.md §2.3, P1-P9).

All pure column expressions — Catalyst pushes these to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clamp_to_null(
    df: DataFrame,
    value_col: str = "value",
    min_val: float | None = None,
    max_val: float | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """P2 — out-of-range values become NULL, rows are *kept*.

    Semantic parity: reference sets out-of-range entries to NaN rather than
    dropping rows (data_handler.py:419-430) so the time grid stays intact.
    """
    out_col = out_col or value_col
    v = F.col(value_col)
    cond = F.lit(True)
    if min_val is not None:
        cond = cond & (v >= F.lit(min_val))
    if max_val is not None:
        cond = cond & (v <= F.lit(max_val))
    return df.withColumn(out_col, F.when(cond, v))


def iqr_bounds(
    df: DataFrame,
    value_col: str = "value",
    group_cols: list[str] | None = None,
    k: float = 1.5,
) -> DataFrame:
    """P7 — per-group [Q1 - k*IQR, Q3 + k*IQR] bounds (utilities.py:12-31).

    Uses the *exact* ``percentile`` aggregate (linear interpolation), which
    matches DuckDB ``quantile_cont``. At 100 TB swap for
    ``percentile_approx`` (t-digest, single pass, mergeable) — the call site
    chooses the tradeoff.
    """
    group_cols = group_cols or []
    q = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.25)").alias("q1"),
        F.expr(f"percentile({value_col}, 0.75)").alias("q3"),
    )
    q = q.withColumn("iqr_lo", F.col("q1") - F.lit(k) * (F.col("q3") - F.col("q1")))
    q = q.withColumn("iqr_hi", F.col("q3") + F.lit(k) * (F.col("q3") - F.col("q1")))
    if group_cols:
        # per-group bounds table is tiny -> broadcast equi-join back
        return df.join(F.broadcast(q), on=group_cols, how="inner")
    return df.crossJoin(F.broadcast(q))


def iqr_filter(
    df: DataFrame,
    value_col: str = "value",
    group_cols: list[str] | None = None,
    k: float = 1.5,
) -> DataFrame:
    """P7 — keep rows inside the IQR band."""
    with_bounds = iqr_bounds(df, value_col, group_cols, k)
    return with_bounds.where(
        F.col(value_col).between(F.col("iqr_lo"), F.col("iqr_hi"))
    ).drop("q1", "q3", "iqr_lo", "iqr_hi")


def detect_daytime(
    df: DataFrame,
    value_col: str = "value",
    site_col: str = "site",
    threshold: float = 0.005,
    quantile: float = 0.95,
) -> DataFrame:
    """P8/P9 — scale per-site by a high quantile, flag ``is_daytime``.

    Reference: daytime.py:11-60 scales by the 95th/99th percentile then
    thresholds. The per-site quantile table is tiny -> broadcast join.
    """
    scale = df.groupBy(site_col).agg(
        F.expr(f"percentile({value_col}, {quantile})").alias("scale_q")
    )
    return df.join(F.broadcast(scale), on=site_col).withColumn(
        "is_daytime",
        F.when(
            F.col(value_col).isNotNull(),
            (F.col(value_col) / F.col("scale_q")) > F.lit(threshold),
        ).otherwise(F.lit(False)),
    )


def drop_future_rows(df: DataFrame, ts_col: str = "ts", now=None) -> DataFrame:
    """T6 — drop rows timestamped after 'now' (data_handler.py:133-137).

    ``now`` is an explicit literal in tests for determinism; defaults to
    ``current_timestamp()`` in production.
    """
    cutoff = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    return df.where(F.col(ts_col) <= cutoff)


def trim_empty_edge_days(df: DataFrame, site_col: str = "site") -> DataFrame:
    """P4 — drop leading/trailing all-NULL days per site
    (matrix_embedding.py:13-24,59-63).

    The per-site (first, last) non-empty date table is tiny -> broadcast.
    """
    nonempty = (
        df.where(F.col("value").isNotNull())
        .groupBy(site_col)
        .agg(F.min("date").alias("first_d"), F.max("date").alias("last_d"))
    )
    return (
        df.join(F.broadcast(nonempty), on=site_col)
        .where(F.col("date").between(F.col("first_d"), F.col("last_d")))
        .drop("first_d", "last_d")
    )
