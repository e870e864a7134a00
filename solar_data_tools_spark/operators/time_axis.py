"""Time-axis standardization operators (SURVEY.md §2.2, T1-T7).

The reference reindexes each series onto a regular grid with pandas
(time_axis_manipulation.py:103-252). Here the grid is generated with
``sequence()`` + ``explode`` and the nearest-neighbor match is a
shuffle-once aggregation: every raw row maps to exactly ONE nearest grid
slot by rounding, so no range join / row explosion is needed — this is the
property that keeps the operator linear at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def infer_sampling_seconds(
    df: DataFrame,
    site_col: str = "site",
    ts_col: str = "ts",
    seq_col: str = "seq",
    round_to: int = 10,
) -> DataFrame:
    """T1 — per-site modal timestamp delta, rounded to ``round_to`` seconds.

    Parity: time_axis_manipulation.py:193-231 takes the mode of consecutive
    diffs rounded to 10 s. Mode is computed with an explicit deterministic
    tie-break (higher count first, then smaller delta) rather than the
    engine's ``mode()`` so results are engine-independent.

    Returns one row per site: (site, sampling_seconds).
    """
    w = Window.partitionBy(site_col).orderBy(ts_col, seq_col)
    diffs = (
        df.withColumn("_prev_ts", F.lag(ts_col).over(w))
        .where(F.col("_prev_ts").isNotNull())
        .withColumn(
            "delta_s",
            (
                F.round(
                    (
                        F.unix_micros(F.col(ts_col))
                        - F.unix_micros(F.col("_prev_ts"))
                    )
                    / F.lit(1_000_000.0 * round_to)
                )
                * round_to
            ).cast("long"),
        )
    )
    counts = diffs.groupBy(site_col, "delta_s").agg(F.count("*").alias("cnt"))
    pick = Window.partitionBy(site_col).orderBy(
        F.desc("cnt"), F.asc("delta_s")
    )
    return (
        counts.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select(site_col, F.col("delta_s").alias("sampling_seconds"))
    )


def standardize_time_axis(
    df: DataFrame,
    sampling_seconds: int,
    site_col: str = "site",
    ts_col: str = "ts",
    seq_col: str = "seq",
    value_col: str = "value",
) -> DataFrame:
    """T2/J6/W8 — snap each series onto a regular grid with nearest-match.

    Parity: time_axis_manipulation.py:233-251 (``pd.date_range`` from
    midnight of day 1 to midnight after the last day, then
    ``reindex(method='nearest', limit=1)``).

    Fill semantics match pandas ``reindex(method='nearest', limit=1)``
    exactly (verified against the reference's golden fixture): a grid slot
    takes the value of the nearest raw point within ONE full sampling step
    (inclusive); equidistant ties go to the LATER raw point; a single raw
    point may serve several adjacent slots.

    Plan shape (scale notes):
      1. one aggregation for per-site (start, end) bounds — tiny table;
      2. grid = ``explode(sequence(start, end, interval))`` — generated,
         never read from storage;
      3. each RAW row replicates to its <=3 candidate slots arithmetically
         (constant fan-out, no range join);
      4. ``row_number() == 1`` per (site, grid_ts) picks the closest raw
         row — one shuffle on (site, grid_ts);
      5. right join onto the generated grid fills unmatched slots with
         NULL — co-partitioned on the same key.

    Returns (site, grid_ts, value) with NULL where no raw row lies within
    one sampling interval.
    """
    us = int(sampling_seconds) * 1_000_000

    bounds = df.groupBy(site_col).agg(
        F.date_trunc("day", F.min(ts_col)).alias("start_day"),
        F.date_trunc("day", F.max(ts_col)).alias("last_day"),
    )
    grid = bounds.select(
        site_col,
        F.explode(
            F.sequence(
                F.col("start_day"),
                # up to but not including midnight after the last day
                F.timestamp_micros(
                    F.unix_micros(F.date_add(F.col("last_day"), 1).cast("timestamp"))
                    - F.lit(us)
                ),
                F.expr(f"INTERVAL {int(sampling_seconds)} SECONDS"),
            )
        ).alias("grid_ts"),
    )

    # candidate slots: k0-1, k0, k0+1 where k0 = nearest slot index; keep
    # candidates within one full step (pandas limit=1 distance bound)
    half = us // 2
    k0 = F.floor((F.unix_micros(F.col(ts_col)) + F.lit(half)) / F.lit(us))
    candidates = (
        df.select(
            F.col(site_col),
            F.col(ts_col),
            F.col(seq_col),
            F.col(value_col),
            k0.alias("_k0"),
        )
        .withColumn("_off", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn(
            "grid_ts", F.timestamp_micros(((F.col("_k0") + F.col("_off")) * us).cast("long"))
        )
        .withColumn(
            "dist_us",
            F.abs(F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("grid_ts"))),
        )
        .where(F.col("dist_us") <= F.lit(us))
    )

    pick = Window.partitionBy(site_col, "grid_ts").orderBy(
        F.asc("dist_us"), F.desc(ts_col), F.asc(seq_col)
    )
    best = (
        candidates.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select(site_col, "grid_ts", value_col)
    )

    return grid.join(best, on=[site_col, "grid_ts"], how="left").select(
        site_col, "grid_ts", value_col
    )


def average_day_profile(
    df: DataFrame,
    site_col: str = "site",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """T3 (first half) — mean value per (site, time-of-day).

    Parity: time_axis_manipulation.py:139-192 builds an average-day profile
    (groupby time-of-day -> mean) to locate solar noon for gross-timezone
    checks. The profile is one groupBy; the scalar noon extraction happens
    on this tiny result.
    """
    return (
        df.groupBy(
            site_col,
            F.hour(ts_col).alias("hh"),
            F.minute(ts_col).alias("mm"),
        )
        .agg(F.avg(value_col).alias("avg_value"))
    )


def resample_aggregate(
    df: DataFrame,
    rule_seconds: int,
    agg: str = "avg",
    site_col: str = "site",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """T7 — tumbling-window resample (deprecated pandas ``resample`` path,
    data_handler.py:139-141). ``window()`` keeps it a single partial+final
    aggregation; in streaming mode the same expression works under a
    watermark.
    """
    agg_col = getattr(F, agg)(value_col).alias(f"{agg}_value")
    return (
        df.groupBy(site_col, F.window(ts_col, f"{int(rule_seconds)} seconds").alias("w"))
        .agg(agg_col)
        .select(
            site_col,
            F.col("w.start").alias("bucket_start"),
            F.col(f"{agg}_value"),
        )
    )


def fix_dst(
    df: DataFrame,
    tz: str,
    standard_offset_hours: float,
    ts_col: str = "ts",
) -> DataFrame:
    """T5 — undo DST so timestamps are fixed-offset local standard time.

    Parity: data_handler.py:842-863 / time_axis_manipulation.py:255-267
    localize to ``tz`` (DST-aware) -> convert to the zone's *standard*
    fixed offset -> strip tz. In Spark: interpret the naive ts in ``tz``
    via ``to_utc_timestamp`` (DST-aware), then apply the fixed standard
    offset arithmetically — all codegen-friendly built-ins.
    """
    return df.withColumn(
        ts_col,
        F.to_utc_timestamp(F.col(ts_col), tz)
        + F.expr(f"INTERVAL {int(standard_offset_hours * 3600)} SECONDS"),
    )
