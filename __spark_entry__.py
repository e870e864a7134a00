"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fleet-report pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the north-star dedup/similarity/text extensions) for the
DuckDB-oracle correctness gate. The actual registry lives in
``solar_data_tools_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from solar_data_tools_spark.registry import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the fleet report (SURVEY §3.1 pipeline, §7.2 slice)
    — ingest events, daily aggregation core, clipping statistics, one row
    per site with dataset-level metrics (reference ``report()`` parity:
    length, capacity, quality, clipping)."""
    from pyspark.sql import functions as F

    from solar_data_tools_spark.operators.canonical import events_as_measurements
    from solar_data_tools_spark.operators.daily import (
        clipping_stats,
        daily_statistics,
        dataset_report,
    )
    from solar_data_tools_spark.session import read_table

    events = read_table(spark, "/root/testdata/sf0.001/events.parquet")
    meas = events_as_measurements(events)
    daily = daily_statistics(meas, slots_per_day=288, approx_capacity=True)
    clip = clipping_stats(meas)
    report = dataset_report(daily)
    clip_report = clip.groupBy("site").agg(
        F.avg((F.col("clip_stat_1") > 0.95).cast("int")).alias("clipped_day_frac")
    )
    return (
        report.join(clip_report, on="site", how="left")
        .select(
            "site",
            "num_days",
            F.round("length_years", 6).alias("length_years"),
            F.round("capacity", 6).alias("capacity"),
            F.round("quality_score", 6).alias("quality_score"),
            F.round("avg_daily_energy", 6).alias("avg_daily_energy"),
            F.round("max_power", 6).alias("max_power"),
            F.round("clipped_day_frac", 6).alias("clipped_day_frac"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
