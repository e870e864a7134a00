"""Join recipes (SURVEY.md §2.4, J1-J6).

The reference's joins are all pandas merges on index; here they are plain
equi joins (Catalyst picks broadcast vs shuffle via AQE). The one join
Spark SQL lacks natively — nearest-timestamp "as-of" (J6) — gets a custom
recipe that avoids range-join blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def annotate(
    raw: DataFrame,
    annotations: DataFrame,
    keys: list[str],
    how: str = "left",
    broadcast_annotations: bool = True,
) -> DataFrame:
    """J1/J2 — join derived boolean/score columns back onto the raw table
    (data_handler.py:1076-1089 ``augment_data_frame``). Daily-level
    annotation tables are tiny relative to the fact table -> broadcast."""
    rhs = F.broadcast(annotations) if broadcast_annotations else annotations
    return raw.join(rhs, on=keys, how=how)


def filter_by_dates(
    df: DataFrame,
    dates: DataFrame,
    site_col: str = "site",
    date_col: str = "date",
) -> DataFrame:
    """J3 — date-membership semi-join (data_handler.py:1070-1074
    ``np.isin(index.date, slct_dates)``)."""
    return df.join(
        F.broadcast(dates.select(site_col, date_col).distinct()),
        on=[site_col, date_col],
        how="left_semi",
    )


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: float | None = None,
    direction: str = "nearest",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """J6 — as-of / nearest-timestamp join.

    For each left row, attach the single right row with the closest
    timestamp (within ``tolerance_seconds``), per ``on`` key.

    Scale strategy: instead of a range join (quadratic blowup), both sides
    are bucketed to coarse time buckets of width ``tolerance`` and joined on
    (key, bucket) with each right row replicated into its neighbor buckets
    (constant factor 3). A window rank then keeps the nearest candidate.
    Shuffle volume is O(|L| + 3|R|), independent of series density.

    ``direction``: 'nearest' | 'backward' (right_ts <= left_ts) |
    'forward' (right_ts >= left_ts).
    """
    if tolerance_seconds is None:
        tolerance_seconds = 86400.0
    bucket_us = int(tolerance_seconds * 1_000_000)
    if bucket_us <= 0:
        raise ValueError("tolerance_seconds must be positive")

    rcols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    # unique left-row id so the rank-1 pick never collapses duplicate rows
    l = left.withColumn("_lid", F.monotonically_increasing_id()).withColumn(
        "_lb", (F.unix_micros(F.col(left_ts)) / bucket_us).cast("long")
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_rts"),
        *[F.col(c) for c in rcols],
    ).withColumn("_rb0", (F.unix_micros(F.col("_rts")) / bucket_us).cast("long"))
    # replicate right rows into the 3 buckets they can satisfy
    r = r.withColumn("_off", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
    r = r.withColumn("_lb", F.col("_rb0") + F.col("_off")).drop("_rb0", "_off")

    joined = l.join(r, on=[on, "_lb"], how="left")
    delta_us = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("_rts"))
    if direction == "backward":
        valid = delta_us >= 0
    elif direction == "forward":
        valid = delta_us <= 0
    else:
        valid = F.lit(True)
    within = F.abs(delta_us) <= F.lit(int(tolerance_seconds * 1_000_000))
    joined = joined.withColumn(
        "_dist",
        F.when(valid & within & F.col("_rts").isNotNull(), F.abs(delta_us)),
    )

    left_keys = [c for c in left.columns]
    # total order: distance, then timestamp, then the carried right
    # VALUES — so even a right side with duplicate timestamps (same key,
    # same ts, different payload) yields an engine- and partitioning-
    # independent pick (same bug class as the sf0.1 SCD2 tie divergence)
    w = Window.partitionBy("_lid").orderBy(
        F.when(F.col("_dist").isNull(), F.lit(1)).otherwise(F.lit(0)),
        F.col("_dist").asc(),
        F.col("_rts").asc(),
        *[F.col(c).asc_nulls_last() for c in rcols],
    )
    ranked = joined.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    matched = F.col("_dist").isNotNull()
    out_cols = left_keys + [
        F.when(matched, F.col("_rts")).alias("matched_ts"),
        *[F.when(matched, F.col(c)).alias(c) for c in rcols],
    ]
    return ranked.select(*out_cols)
