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
    """Flagship query: the fleet DataHandler facade (SURVEY §3.1, the
    reference's front door) — one call ingests events, standardizes,
    scores, flags (clipping / capacity change / time shift / tz), and
    emits the reference's full 11-field ``report()`` per site with the
    fleet runner's per-stage error columns. Golden-validated against the
    reference fixture (capacity 6.745, quality 0.995) in
    tests/test_fleet_report.py."""
    from pyspark.sql import functions as F

    from solar_data_tools_spark.operators.canonical import events_as_measurements
    from solar_data_tools_spark.plans.fleet import fleet_report
    from solar_data_tools_spark.session import read_table

    events = read_table(spark, "/root/testdata/sf0.001/events.parquet")
    meas = events_as_measurements(events).select("site", "ts", "seq", "value")
    # per-site native-cadence mode (no explicit sampling): each site
    # grids at its own inferred, divisor-snapped cadence
    rep = fleet_report(meas, fix_shifts=True, correct_tz=True)
    return rep.select(
        "site",
        "num_days",
        F.round("length_years", 6).alias("length_years"),
        F.round("capacity", 6).alias("capacity"),
        F.round("sampling_minutes", 6).alias("sampling_minutes"),
        F.round("quality_score", 6).alias("quality_score"),
        F.round("clearness_score", 6).alias("clearness_score"),
        "inverter_clipping",
        F.round("clipped_fraction", 6).alias("clipped_fraction"),
        "capacity_change",
        "data_quality_warning",
        "time_shift_correction",
        "time_zone_correction",
        "run_pipeline_error",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
