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

from solar_data_tools_spark.operators.canonical import (
    pround,
    tick_avg,
    tick_sum,
)


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
                pround(
                    (
                        F.unix_micros(F.col(ts_col))
                        - F.unix_micros(F.col("_prev_ts"))
                    )
                    / F.lit(1_000_000.0 * round_to),
                    0,
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


def snap_sampling_to_day_divisor(
    sampling: DataFrame,
    site_col: str = "site",
) -> DataFrame:
    """Snap each site's inferred sampling to the nearest DIVISOR of
    86400 s (ties toward the smaller divisor), so a day always holds a
    whole number of grid slots. The reference's real-world cadences
    (1/5/15/30/60 min) are all divisors already; synthetic or jittery
    feeds can infer moduli like 340 s whose grid would drift across
    midnight and break the day-matrix contract.

    Input: (site, sampling_seconds). Output adds ``grid_seconds``.
    The table is site-sized — the divisor cross join is trivially small.
    """
    spark = sampling.sparkSession
    divisors = [d for d in range(1, 86401) if 86400 % d == 0]
    divs = spark.createDataFrame(
        [(d,) for d in divisors], "grid_seconds long"
    )
    j = sampling.crossJoin(F.broadcast(divs))
    pick = Window.partitionBy(site_col).orderBy(
        F.abs(F.col("grid_seconds") - F.col("sampling_seconds")),
        F.asc("grid_seconds"),
    )
    return (
        j.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select(site_col, "sampling_seconds", "grid_seconds")
    )


def standardize_time_axis(
    df: DataFrame,
    sampling_seconds: int | DataFrame,
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

    ``sampling_seconds`` may be a scalar (one fleet-wide grid — the
    single-site reference semantics) or a per-site DataFrame
    (site, sampling_seconds) — e.g. ``infer_sampling_seconds``'s output
    — so a heterogeneous fleet grids each site at its NATIVE cadence
    (regridding a 48-min site onto a 5-min fleet grid would be ~90 %
    null slots and garbage density scores). The per-site table is tiny
    and broadcasts.

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
    if isinstance(sampling_seconds, DataFrame):
        samp = sampling_seconds.select(
            site_col,
            (F.col("sampling_seconds").cast("long") * 1_000_000).alias(
                "_us"
            ),
        )
        prepared = df.join(F.broadcast(samp), site_col)
        us = F.col("_us")
    else:
        prepared = df.withColumn(
            "_us", F.lit(int(sampling_seconds) * 1_000_000)
        )
        us = F.col("_us")

    bounds = prepared.groupBy(site_col).agg(
        F.date_trunc("day", F.min(ts_col)).alias("start_day"),
        F.date_trunc("day", F.max(ts_col)).alias("last_day"),
        F.first("_us").alias("_us"),
    )
    grid = bounds.select(
        site_col,
        F.explode(
            F.sequence(
                F.col("start_day"),
                # up to but not including midnight after the last day
                F.timestamp_micros(
                    F.unix_micros(
                        F.date_add(F.col("last_day"), 1).cast("timestamp")
                    )
                    - F.col("_us")
                ),
                F.make_dt_interval(
                    F.lit(0), F.lit(0), F.lit(0),
                    (F.col("_us") / F.lit(1_000_000)).cast("int"),
                ),
            )
        ).alias("grid_ts"),
    )

    # candidate slots: k0-1, k0, k0+1 where k0 = nearest slot index; keep
    # candidates within one full step (pandas limit=1 distance bound)
    half = (us / F.lit(2)).cast("long")
    k0 = F.floor((F.unix_micros(F.col(ts_col)) + half) / us)
    candidates = (
        prepared.select(
            F.col(site_col),
            F.col(ts_col),
            F.col(seq_col),
            F.col(value_col),
            F.col("_us"),
            k0.alias("_k0"),
        )
        .withColumn("_off", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn(
            "grid_ts",
            F.timestamp_micros(
                ((F.col("_k0") + F.col("_off")) * F.col("_us")).cast("long")
            ),
        )
        .withColumn(
            "dist_us",
            F.abs(F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("grid_ts"))),
        )
        .where(F.col("dist_us") <= F.col("_us"))
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
    exact_digits: int | None = None,
) -> DataFrame:
    """T3 (first half) — mean value per (site, time-of-day).

    Parity: time_axis_manipulation.py:139-192 builds an average-day profile
    (groupby time-of-day -> mean) to locate solar noon for gross-timezone
    checks. The profile is one groupBy; the scalar noon extraction happens
    on this tiny result.

    ``exact_digits`` (round 9): when set, the mean is an order-free
    integer tick sum (``canonical.tick_avg``) — required when the output
    rides an oracle hash (certified q25); float partial sums drift by
    ulps across partition layouts and a downstream rounding amplifies a
    ulp into a tick near half-tick sums.
    """
    mean = (
        tick_avg(value_col, exact_digits)
        if exact_digits is not None
        else F.avg(value_col)
    )
    return (
        df.groupBy(
            site_col,
            F.hour(ts_col).alias("hh"),
            F.minute(ts_col).alias("mm"),
        )
        .agg(mean.alias("avg_value"))
    )


def resample_aggregate(
    df: DataFrame,
    rule_seconds: int,
    agg: str = "avg",
    site_col: str = "site",
    ts_col: str = "ts",
    value_col: str = "value",
    exact_digits: int | None = None,
) -> DataFrame:
    """T7 — tumbling-window resample (deprecated pandas ``resample`` path,
    data_handler.py:139-141). ``window()`` keeps it a single partial+final
    aggregation; in streaming mode the same expression works under a
    watermark.

    ``exact_digits`` (round 9): engine-exact tick aggregation for
    ``avg``/``sum`` (see ``canonical.tick_avg``/``tick_sum``) — the
    certified path (q24).
    """
    if exact_digits is not None and agg in ("avg", "sum"):
        agg_col = (
            tick_avg(value_col, exact_digits)
            if agg == "avg"
            else tick_sum(value_col, exact_digits)
        ).alias(f"{agg}_value")
    else:
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
