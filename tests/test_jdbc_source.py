"""S4 — JDBC source exercised against a REAL database (round 10).

The reference's DB loaders (Redshift/Cassandra, dataio.py:37-168) are
deprecated stubs that raise; our `jdbc_source` wraps Spark's JDBC
reader, which until now was 'untested (no DB)' — the last partial in
the SURVEY §2 table. Spark bundles Apache Derby (the embedded JVM
database backing its Hive metastore), so the reader CAN be driven end
to end in this container: write a measurement slice into an embedded
Derby table through Spark's JDBC sink, read it back through
`jdbc_source` — both plain and PARTITIONED (numPartitions +
partitionColumn, the 100 TB shape where each executor opens its own
cursor over a key range) — and require exact row equality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solar_data_tools_spark.sources.readers import jdbc_source

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "fleetdb"
    # keep Derby's log out of the repo cwd
    spark._jvm.java.lang.System.setProperty(
        "derby.stream.error.field",
        "java.lang.System.err",
    )
    return f"jdbc:derby:{db};create=true"


def _sample(spark, n=500):
    return spark.range(n).select(
        (F.col("id") % 5).cast("int").alias("site"),
        F.col("id").alias("seq"),
        ((F.col("id") % 97) / 10.0).alias("value"),
    )


def test_jdbc_roundtrip_plain(spark, derby_url):
    df = _sample(spark)
    (
        df.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "meas")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    back = jdbc_source(spark, derby_url, "meas", driver=DRIVER)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_jdbc_partitioned_read_matches_and_splits(spark, derby_url):
    """The scale path: numPartitions/partitionColumn splits the table
    into per-executor range cursors; the union must equal the plain
    read exactly and actually fan out over >1 partition."""
    back = jdbc_source(
        spark,
        derby_url,
        "meas",
        driver=DRIVER,
        partitionColumn="seq",
        lowerBound="0",
        upperBound="500",
        numPartitions="4",
    )
    assert back.rdd.getNumPartitions() == 4
    plain = jdbc_source(spark, derby_url, "meas", driver=DRIVER)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # predicate pushdown reaches the database: the filtered read's plan
    # carries the filter (Spark pushes it into the JDBC scan)
    filt = back.where(F.col("site") == 3)
    assert filt.count() == 100


def test_jdbc_filter_is_pushed_into_the_database_query(spark, derby_url):
    """Plan audit (VERDICT r10 item 7): at the 100 TB shape the filter
    must execute INSIDE the database (`WHERE site = 3` in the JDBC
    query each cursor sends), not in Spark after shipping every row
    over the wire. Spark's JDBC relation reports what it pushed in the
    scan node's PushedFilters — require the EqualTo there, and require
    column pruning (ReadSchema without the unused `value` column)."""
    back = jdbc_source(spark, derby_url, "meas", driver=DRIVER)
    filt = back.where(F.col("site") == 3).select("site", "seq")
    plan = filt._jdf.queryExecution().executedPlan().toString()
    scan = next(
        (ln for ln in plan.splitlines() if "JDBCRelation" in ln), plan
    )
    assert "PushedFilters" in scan, plan
    pushed = scan.split("PushedFilters:")[1].split("ReadSchema:")[0]
    assert "EqualTo(site,3)" in pushed, (
        f"site=3 not pushed to the JDBC query: {scan}"
    )
    assert "ReadSchema:" in scan, scan
    read_schema = scan.split("ReadSchema:")[1]
    assert "site" in read_schema and "value" not in read_schema, (
        f"unused column not pruned from the JDBC projection: {scan}"
    )
