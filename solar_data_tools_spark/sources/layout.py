"""Storage layout for fleet-scale tables (SURVEY §4.2 custom-work item 3).

At 100 TB the measurement table's physical layout IS the query plan:

* **partition by date** — day-range queries (P3) prune files before any
  I/O happens;
* **bucket by site** — every per-site stage (daily aggregation, solver
  UDFs, annotation joins) reads co-partitioned data and skips its
  shuffle: two tables bucketed on ``site`` with the same bucket count
  join with NO Exchange in the plan (asserted by a test).

Bucketed writes go through ``saveAsTable`` (bucket metadata lives in the
catalog); the session's warehouse dir is local in tests, a metastore in
production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_fact_measurement(
    df: DataFrame,
    table: str,
    buckets: int = 64,
    partition_col: str = "date",
    bucket_col: str = "site",
) -> None:
    """Write the long measurement table partitioned by day, bucketed and
    sorted by site within buckets."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .partitionBy(partition_col)
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def write_bucketed(
    df: DataFrame, table: str, buckets: int = 64, bucket_col: str = "site"
) -> None:
    """Bucketed (unpartitioned) write for derived per-site tables — the
    daily table, flag tables, solver outputs — so every later join back
    to the fact table on ``site`` is co-located."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
