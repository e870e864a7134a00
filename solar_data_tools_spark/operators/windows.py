"""Window / ordered operators (SURVEY.md §2.6, W1-W12).

All built on Spark window functions with explicit deterministic ordering
``(ts, seq)`` — never shuffle order (SURVEY §7.4 risk 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _w(site_col: str, ts_col: str, seq_col: str) -> Window:
    return Window.partitionBy(site_col).orderBy(ts_col, seq_col)


def first_diff(
    df: DataFrame,
    site_col: str = "site",
    ts_col: str = "ts",
    seq_col: str = "seq",
    value_col: str = "value",
    out_col: str = "diff1",
) -> DataFrame:
    """W1 — ``v - lag(v)`` per series (np.diff parity: data_quality.py:59,
    time_shifts.py:179-181)."""
    w = _w(site_col, ts_col, seq_col)
    return df.withColumn(out_col, F.col(value_col) - F.lag(value_col).over(w))


def second_diff(
    df: DataFrame,
    site_col: str = "site",
    ts_col: str = "ts",
    seq_col: str = "seq",
    value_col: str = "value",
    out_col: str = "diff2",
) -> DataFrame:
    """W2 — second-order difference ``x[t] - 2x[t-1] + x[t-2]``; its daily
    L1 norm is the clear-day smoothness metric (clear_day_detection.py:64)."""
    w = _w(site_col, ts_col, seq_col)
    return df.withColumn(
        out_col,
        F.col(value_col)
        - 2 * F.lag(value_col, 1).over(w)
        + F.lag(value_col, 2).over(w),
    )


def find_runs(
    df: DataFrame,
    site_col: str = "site",
    ts_col: str = "ts",
    seq_col: str = "seq",
    value_col: str = "value",
) -> DataFrame:
    """W4 — run-length encoding of consecutive equal values
    (utilities.py:53-80 ``find_runs``).

    Classic two-window recipe: change flag -> running sum = run id ->
    group by run. Both windows share one partitioning (single shuffle);
    the final groupBy re-shuffles only (site, run_id).
    """
    w = _w(site_col, ts_col, seq_col)
    v = F.col(value_col)
    prev = F.lag(value_col).over(w)
    changed = F.when(
        prev.isNull() | (v != prev) | (v.isNull() != prev.isNull()), 1
    ).otherwise(0)
    with_runs = df.withColumn("_chg", changed).withColumn(
        "run_id", F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return with_runs.groupBy(site_col, "run_id").agg(
        F.first(value_col).alias("run_value"),
        F.min(ts_col).alias("run_start"),
        F.max(ts_col).alias("run_end"),
        F.count("*").alias("run_length"),
    )


def rolling_mean(
    df: DataFrame,
    n_before: int,
    n_after: int,
    site_col: str = "site",
    ts_col: str = "ts",
    seq_col: str = "seq",
    value_col: str = "value",
    out_col: str = "rolling_mean",
    exact_digits: int | None = None,
) -> DataFrame:
    """W9 — centered rolling mean (model_soiling.py:71-73
    ``rolling(n, center=True).mean()``).

    ``exact_digits`` (round 9): when set, the window mean is computed as
    ``sum(ticks)/count/10^d`` (per-term integer quantization, see
    ``canonical.tick_sum``) so the value is bit-equal to a sequential
    oracle regardless of how Spark's windowed partial sums associate —
    the certified path (q16). No overflow guard needed here: the window
    is bounded at ``n_before+n_after+1`` terms, so the tick sum is
    bounded by the per-term 2^53 contract times a small constant."""
    w = _w(site_col, ts_col, seq_col).rowsBetween(-n_before, n_after)
    if exact_digits is not None:
        from solar_data_tools_spark.operators.canonical import ticks

        t = ticks(F.col(value_col), exact_digits)
        mean = (
            F.sum(t).over(w)
            / F.count(value_col).over(w)
            / F.lit(float(10**exact_digits))
        )
    else:
        mean = F.avg(value_col).over(w)
    return df.withColumn(out_col, mean)


def gap_fill_linear(
    df: DataFrame,
    site_col: str = "site",
    ts_col: str = "ts",
    seq_col: str = "seq",
    value_col: str = "value",
    out_col: str = "value_filled",
) -> DataFrame:
    """W7 — linear interpolation of missing values along each series
    (data_filling.py:24-28 ``DataFrame.interpolate()`` down day columns).

    Standard Spark gap-fill recipe, no UDF:
      * carry last non-null value/ts forward (window to current row),
      * carry next non-null value/ts backward (window from current row),
      * interpolate by timestamp fraction.
    Edge semantics match pandas ``interpolate()`` default: leading NULLs
    stay NULL, trailing NULLs are forward-filled.
    """
    v = F.col(value_col)
    base = Window.partitionBy(site_col).orderBy(ts_col, seq_col)
    w_back = base.rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = base.rowsBetween(0, Window.unboundedFollowing)

    ts_us = F.unix_micros(F.col(ts_col))
    prev_v = F.last(v, ignorenulls=True).over(w_back)
    prev_t = F.last(F.when(v.isNotNull(), ts_us), ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    next_t = F.first(F.when(v.isNotNull(), ts_us), ignorenulls=True).over(w_fwd)

    frac = (ts_us - prev_t) / (next_t - prev_t)
    interp = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), F.lit(None))
        .when(next_v.isNull(), prev_v)  # trailing gap: ffill
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return df.withColumn(out_col, interp)


def dedup_timestamps(
    df: DataFrame,
    site_col: str = "site",
    ts_col: str = "ts",
    seq_col: str = "seq",
) -> DataFrame:
    """U2 — drop duplicated timestamps keep-first
    (time_axis_manipulation.py:60-61). Deterministic "first" = lowest seq."""
    w = Window.partitionBy(site_col, ts_col).orderBy(seq_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def circular_roll_slots(
    df: DataFrame,
    shifts: DataFrame,
    slots_per_day: int | str,
    site_col: str = "site",
) -> DataFrame:
    """W6 — circular per-day roll of the slot index (time-shift correction,
    time_shifts.py:345-361 ``np.roll`` per day column; data_handler.py:637-645).

    ``shifts`` is a small (site, date, roll_k) table (solver-layer output);
    broadcast-joined, then ``slot' = (slot + k) % slots_per_day`` — a pure
    projection, zero extra shuffles of the big table. ``slots_per_day``
    may be a column NAME on ``df`` (per-site grids).
    """
    m = (
        F.col(slots_per_day)
        if isinstance(slots_per_day, str)
        else F.lit(slots_per_day)
    )
    return (
        df.join(F.broadcast(shifts), on=[site_col, "date"], how="left")
        .withColumn(
            "slot",
            ((F.col("slot") + F.coalesce(F.col("roll_k"), F.lit(0))) % m + m) % m,
        )
        .drop("roll_k")
    )


def segment_pooled_diffs(
    df: DataFrame,
    site_col: str = "site",
    ts_col: str = "ts",
    seq_col: str = "seq",
    value_col: str = "value",
    eps: float = 1e-12,
    exact_digits: int | None = None,
) -> DataFrame:
    """W5 — pool adjacent nonzero first-differences into segments and report
    the summed diff mass per segment (utilities.py:124-140 ``segment_diffs``/
    ``make_pooled_dsig``). Same run-id trick as :func:`find_runs` applied to
    the zero/nonzero flag of the diff signal.

    ``pooled_diff`` is a float sum, so certification needs order-free
    terms. ``exact_digits`` sums in integer ticks (the ``tick_sum``
    contract — certified callers MUST pass it, enforced by the lint);
    without it, the helper self-enforces the only other exact case by
    RAISING at execution on any non-integer-valued diff (r9 verdict
    item 4 — previously this precondition lived only in the lint
    allowlist's justification string, so a new caller with fractional
    values silently inherited an order-dependent sum)."""
    w = _w(site_col, ts_col, seq_col)
    d = F.col(value_col) - F.lag(value_col).over(w)
    with_d = df.withColumn("_d", d).where(F.col("_d").isNotNull())
    nz = (F.abs(F.col("_d")) > eps).cast("int")
    w2 = _w(site_col, ts_col, seq_col)
    with_flag = with_d.withColumn("_nz", nz)
    prev_nz = F.lag("_nz").over(w2)
    changed = F.when(prev_nz.isNull() | (F.col("_nz") != prev_nz), 1).otherwise(0)
    seg = with_flag.withColumn("_chg", changed).withColumn(
        "seg_id", F.sum("_chg").over(w2.rowsBetween(Window.unboundedPreceding, 0))
    )
    if exact_digits is not None:
        from solar_data_tools_spark.operators.canonical import tick_sum

        pooled = tick_sum("_d", int(exact_digits))
    else:
        # integer-valued doubles < 2^53 sum exactly in any order; a
        # fractional diff would make the sum layout-dependent — fail
        # loudly instead (pass exact_digits for fractional data)
        # magnitude first (ADVICE r10): past ~9e15, F.floor's LONG
        # clamp would make the integer-valuedness test lie ("non-
        # integer-valued diff" for a perfectly integer 2^63), and
        # which of the row-level vs aggregate-level raises surfaced
        # was plan-dependent — ordering the magnitude condition ahead
        # of the integer test inside the SAME row-level CASE means a
        # huge value always gets the magnitude wording.
        checked = F.when(
            F.abs(F.col("_d")) >= F.lit(9.0e15),
            F.raise_error(
                F.concat(
                    F.lit("segment_pooled_diffs: |diff| = "),
                    F.col("_d").cast("string"),
                    F.lit(
                        " >= 9.0e15 — integer-valued doubles past "
                        "2^53 no longer sum exactly; pass "
                        "exact_digits=<d> (tick-exact LONG path)"
                    ),
                )
            ),
        ).when(
            F.col("_d") != F.floor(F.col("_d")).cast("double"),
            F.raise_error(
                F.concat(
                    F.lit(
                        "segment_pooled_diffs: non-integer-valued diff "
                    ),
                    F.col("_d").cast("string"),
                    F.lit(
                        " — float sums of fractional terms are order-"
                        "dependent; pass exact_digits=<d> for the "
                        "tick-exact path"
                    ),
                )
            ),
        ).otherwise(F.col("_d"))
        # ...and the MAGNITUDE half of the precondition (r10 review):
        # integer-valued terms only sum exactly while every partial
        # stays under 2^53; max|d| * count bounds every partial
        # layout-independently (the guarded_long_sum pattern).
        bound = F.max(F.abs(F.col("_d"))) * F.count("_d")
        pooled = F.when(
            bound >= F.lit(9.0e15),
            F.raise_error(
                F.concat(
                    F.lit(
                        "segment_pooled_diffs: max|diff| * count = "
                    ),
                    bound.cast("string"),
                    F.lit(
                        " >= 9.0e15 — integer-valued doubles past "
                        "2^53 no longer sum exactly; pass "
                        "exact_digits=<d> (tick-exact LONG path)"
                    ),
                )
            ),
        ).otherwise(F.sum(checked))
    return (
        seg.where(F.col("_nz") == 1)
        .groupBy(site_col, "seg_id")
        .agg(
            F.min(ts_col).alias("seg_start"),
            F.max(ts_col).alias("seg_end"),
            pooled.alias("pooled_diff"),
            F.count("*").alias("seg_length"),
        )
    )
