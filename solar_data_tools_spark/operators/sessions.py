"""Sessionization and slowly-changing-dimension (SCD2) merge recipes.

Standard large-scale event-pipeline operators built on the same window
conventions as the solar layer (gap-based session ids are the W4 run-id
trick applied to time gaps). The SCD2 merge emulates MERGE INTO with
anti-join + union — the v1 pattern when no Delta/Iceberg jars are on the
classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int,
    site_col: str = "site",
    ts_col: str = "ts",
    seq_col: str = "seq",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions per key: a new session starts when the gap from
    the previous event exceeds ``gap_seconds``.

    One window partitioning (site) shared by the lag and the running sum,
    then one groupBy on (site, session_id) — two shuffles total, both on
    keys that AQE can coalesce.
    """
    w = Window.partitionBy(site_col).orderBy(ts_col, seq_col)
    gap_us = int(gap_seconds) * 1_000_000
    prev = F.lag(ts_col).over(w)
    new_session = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)) > gap_us),
        1,
    ).otherwise(0)
    with_sid = events.withColumn("_new", new_session).withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_sid.groupBy(site_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(value_col).alias("session_value"),
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    compare_cols: list[str],
    effective_col: str = "effective_from",
    update_ts_col: str = "update_ts",
) -> DataFrame:
    """SCD type-2 upsert without MERGE INTO (no lakehouse jars in v1):

      * rows in ``dim`` whose key has a changed update -> closed out
        (``is_current = false``),
      * changed/new updates -> appended as the current version,
      * untouched dim rows pass through.

    Plan shape: one equi-join of dim x latest-updates + a union — both
    sides shuffle once on the key; at scale this is the standard
    pre-lakehouse CDC pattern.
    """
    # deterministic latest-row choice: ties in update_ts (two updates of
    # the same key in one batch/date) break on the compared values
    # themselves, so the pick is engine- and partitioning-independent;
    # any ties still left are value-identical in every output column.
    # (Caught at sf0.1, where same-date orders per customer are common —
    # an untie-broken row_number diverged from the oracle on 11k keys.)
    latest_w = Window.partitionBy(key_col).orderBy(
        F.desc(update_ts_col), *[F.desc(c) for c in compare_cols]
    )
    latest = (
        updates.withColumn("_rn", F.row_number().over(latest_w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    changed_keys = (
        dim.alias("d")
        .join(latest.alias("u"), on=key_col, how="inner")
        .where(
            " OR ".join(f"NOT (d.{c} <=> u.{c})" for c in compare_cols)
        )
        .select(key_col)
    )
    new_keys = latest.join(dim, on=key_col, how="left_anti").select(key_col)
    affected = changed_keys.unionByName(new_keys).distinct()

    closed = (
        dim.join(affected, on=key_col, how="left_semi")
        .withColumn("is_current", F.lit(False))
    )
    untouched = dim.join(affected, on=key_col, how="left_anti").withColumn(
        "is_current", F.lit(True)
    )
    incoming = (
        latest.join(affected, on=key_col, how="left_semi")
        .withColumnRenamed(update_ts_col, effective_col)
        .withColumn("is_current", F.lit(True))
    )
    dim_cols = [key_col, *compare_cols, effective_col, "is_current"]
    return (
        closed.select(*dim_cols)
        .unionByName(untouched.select(*dim_cols))
        .unionByName(incoming.select(*dim_cols))
    )
