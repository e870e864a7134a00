"""Scan operators (SURVEY.md §2.1).

S1/S2 — CSV scans (local or object store): ``spark.read.csv`` handles both;
an s3a:// path is the same reader (parity: sdt_dask/dataplugs/csv_plug.py:9-57,
S3Bucket_plug.py:1-87 — those fetch one file per site into pandas; Spark
reads the whole fleet as one datasource with partition parallelism).

S5 — long DB-style table -> per-sensor wide series (parity:
time_axis_manipulation.py:27-100 ``make_time_series``).

S3/S4 (PVDAQ API, Redshift/Cassandra) are deprecated in the reference
itself (dataio.py raises) — represented here by :func:`jdbc_source` for the
JDBC-shaped ones and intentionally no HTTP source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_timeseries_csv(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    site_from_filename: bool = False,
) -> DataFrame:
    """S1/S2 — read time-series CSVs (local path, glob, or s3a:// URI).

    Schema inference happens once on a sample; the timestamp column is
    parsed to TIMESTAMP. With ``site_from_filename`` the site key is derived
    from the input file name (one-file-per-site layouts, the reference's
    DataPlug convention).
    """
    df = spark.read.csv(path, header=True, inferSchema=True)
    if ts_col in df.columns:
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if site_from_filename:
        df = df.withColumn(
            "site", F.regexp_extract(F.input_file_name(), r"([^/]+)\.csv$", 1)
        )
    return df


def make_time_series(
    df: DataFrame,
    ts_col: str = "ts",
    site_col: str = "site",
    sensor_col: str = "sensor",
    value_col: str = "meas_val_f",
    min_nonnull: int = 200,
    tz_offset_hours: int = 0,
) -> DataFrame:
    """S5 — canonicalize a long DB-style table into per-(site,sensor) series.

    Parity with ``make_time_series`` (time_axis_manipulation.py:27-100):
    sort, dedupe timestamps per key (keep first), drop keys with fewer than
    ``min_nonnull`` non-null values, shift timestamps by a timezone offset.
    The reference pivots each key to a column of one wide frame; at fleet
    scale we keep the long format with a composite ``series_key`` — the
    reference's own analyses are all per-key anyway.
    """
    key = F.format_string("%s_%s", F.col(site_col), F.col(sensor_col))
    base = df.select(
        key.alias("series_key"),
        (F.col(ts_col) + F.expr(f"INTERVAL {int(tz_offset_hours)} HOURS")).alias("ts"),
        F.col(value_col).alias("value"),
    )
    # dedupe timestamps keep-first (deterministic: min value as tiebreak)
    from pyspark.sql import Window

    w = Window.partitionBy("series_key", "ts").orderBy(F.asc_nulls_last("value"))
    deduped = (
        base.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    counts = deduped.where(F.col("value").isNotNull()).groupBy("series_key").agg(
        F.count("*").alias("n_nonnull")
    )
    keep = counts.where(F.col("n_nonnull") >= min_nonnull).select("series_key")
    return deduped.join(F.broadcast(keep), on="series_key", how="left_semi")


def jdbc_source(
    spark: SparkSession, url: str, table: str, **options
) -> DataFrame:
    """S4 — JDBC reader for DB-backed fleets (reference's Redshift/Cassandra
    loaders are deprecated stubs, dataio.py:37-168). Partitioned reads via
    the standard numPartitions/partitionColumn options."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_result(
    df: DataFrame, path: str, fmt: str = "parquet", partition_by: list[str] | None = None
) -> None:
    """S6 — fleet-summary sink (parity: sdt_dask runner.get_result -> CSV).
    Parquet by default; partition columns for downstream pruning."""
    writer = df.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_training_shards(
    df,
    path: str,
    rows_per_shard: int,
    id_col: str = "doc_id",
    seed: int | str = 0,
    fmt: str = "parquet",
) -> int:
    """Training-shard sink: write the corpus as globally-shuffled,
    fixed-size shards — the layout training data loaders consume
    (uniform shard sizes => uniform loader work; a seeded permutation
    => epoch-reproducible example order without a loader-side shuffle
    buffer that would have to span the corpus).

    Plan: seeded md5 permutation via :func:`~solar_data_tools_spark.
    operators.sampling.global_shuffle_rank` (two-pass range plan — no
    single-partition window), ``shard = (rank-1) // rows_per_shard``,
    explicit ``repartition(n_shards, shard)`` (REPARTITION_BY_NUM, so
    AQE never folds shard files together), rows sorted by rank within
    each shard, one ``shard=N`` directory per shard via partitionBy.
    Every shard except the last holds exactly ``rows_per_shard`` rows.

    Returns the number of shards written.
    """
    from pyspark.sql import functions as F

    from solar_data_tools_spark.operators.sampling import global_shuffle_rank

    if rows_per_shard <= 0:
        raise ValueError("rows_per_shard must be positive")
    # row count from the RAW input (a scan-only job) — counting the
    # ranked frame instead would re-execute the whole permutation plan
    n_rows = df.count()
    n_shards = max(1, -(-n_rows // rows_per_shard))
    ranked = global_shuffle_rank(df, id_col=id_col, seed=seed)
    sharded = ranked.withColumn(
        "shard",
        ((F.col("shuffle_rank") - 1) / rows_per_shard).cast("long"),
    )
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_rank")
        # the rank did its job (shard id + in-shard order); don't leak
        # 8 bytes/row of helper column into every shard file
        .drop("shuffle_rank")
        .write.mode("overwrite")
        .format(fmt)
        .partitionBy("shard")
        .save(path)
    )
    return n_shards


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    line_col: str = "raw_line",
    streaming: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """JSONL corpus ingest with a quarantine split — the front door of
    an LLM-data pipeline (crawl dumps, exported datasets, and eval sets
    ship as JSON Lines, not parquet).

    Returns ``(docs, quarantine)``: ``docs`` has exactly the columns of
    ``schema`` for every line that parsed; ``quarantine`` carries the
    raw text of every line that did not (truncated records, invalid
    JSON, wrong top-level type) so bad input is INSPECTABLE, never
    silently dropped — at crawl scale a corrupt shard upstream shows up
    as a quarantine spike, not as a mystery row-count drift.

    Plan shape (the 100 TB contract):

    * ``spark.read.text`` + ``from_json`` — ONE pass, pure JVM codegen
      (``JsonToStructs``), schema mandatory. Deliberately NOT
      ``spark.read.json``: schema inference is a full extra scan of
      the input, and filtering on only the PERMISSIVE-mode corrupt
      column is disallowed by Spark without caching the parse
      (SPARK-21610) — caching a 100 TB parse is not a plan. The
      text+from_json split has neither problem and the two outputs
      share one scan subtree.
    * Corrupt detection uses ``from_json``'s own
      ``columnNameOfCorruptRecord`` option, NOT struct-nullness:
      measured on this Spark (see the roundtrip test), a malformed
      line parses to an all-NULL-FIELDS struct — never a NULL struct —
      so a nullness test quarantines nothing. With the corrupt column,
      invalid JSON, non-object top-levels, AND per-field type
      mismatches all land in quarantine with the raw line, while valid
      objects with MISSING fields are accepted with NULLs (JSONL
      corpora are sparse by convention) and unknown extra fields are
      ignored.
    * Blank lines (a trailing-newline artifact of many writers) are
      neither docs nor errors and are dropped explicitly.
    * The same function builds the STREAMING face (``streaming=True``
      uses ``readStream``): from_json is row-local, so continuous
      ingest parses with the identical expression — parity is by
      construction, and the quarantine stream can feed an alerting
      sink.
    * Compression caveat (docstring is the right place — this is a
      data-layout choice, not code): ``.gz`` JSONL is NOT splittable —
      one task per file regardless of size. At scale, shard files to
      ~128-512 MB, or use zstd/bzip2, or decompress-and-repartition
      once on landing.

    Reference parity: solar-data-tools has no JSON source (its
    dataio.py API loaders are deprecated and raise); this is
    north-star-extension surface, S-row "JSONL scan" in COVERAGE.md.
    """
    corrupt = "_corrupt_record"
    if corrupt in schema:
        raise ValueError(
            f"schema must not name the reserved column {corrupt!r}"
        )
    reader = spark.readStream if streaming else spark.read
    raw = reader.text(path).withColumnRenamed("value", line_col)
    nonblank = raw.where(F.length(F.trim(F.col(line_col))) > 0)
    parsed = nonblank.select(
        F.col(line_col),
        F.from_json(
            F.col(line_col),
            f"{schema}, {corrupt} string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt},
        ).alias("_doc"),
    )
    ok = F.col(f"_doc.{corrupt}").isNull()
    docs = parsed.where(ok).select("_doc.*").drop(corrupt)
    quarantine = parsed.where(~ok).select(line_col)
    return docs, quarantine
