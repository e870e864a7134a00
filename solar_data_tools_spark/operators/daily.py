"""Daily aggregation core (SURVEY.md §2.5, A1-A23).

The reference computes each daily statistic in a separate numpy pass over
the day matrix; here they collapse into ONE ``groupBy(site, date)``
aggregation (single shuffle, map-side partial aggregation) producing the
``fact_daily`` table, plus one ``groupBy(site)`` for dataset-level scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solar_data_tools_spark.operators.canonical import (
    pround,
    tick_avg,
    tick_sum,
)


def site_capacity(
    df: DataFrame,
    site_col: str = "site",
    value_col: str = "value",
    quantile: float = 0.95,
    approx: bool = False,
) -> DataFrame:
    """A3 — per-site capacity estimate = 95th percentile of all values.

    Parity: data_handler.py:431-433 (``np.nanquantile(matrix, 0.95)``).
    ``approx=True`` switches to the mergeable single-pass sketch for
    fleet-scale runs; exact percentile is kept for oracle tests.
    """
    if approx:
        expr = F.percentile_approx(value_col, quantile, 10000)
    else:
        expr = F.expr(f"percentile({value_col}, {quantile})")
    return df.groupBy(site_col).agg(expr.alias("capacity"))


def daily_statistics(
    df: DataFrame,
    slots_per_day: int = 288,
    site_col: str = "site",
    value_col: str = "value",
    density_threshold: float = 0.02,
    sun_threshold_frac: float = 0.05,
    approx_capacity: bool = False,
    sampling_col: str | None = None,
) -> DataFrame:
    """One wide pass building the ``fact_daily`` table.

    Columns and their reference parity:

    - ``energy``   — A1: ``sum(v) * 24 / slots_per_day`` (Riemann integral,
      data_handler.py:1121-1125)
    - ``density``  — A2: fraction of slots with ``v > 0.02 * capacity``
      (data_quality.py:35-41)
    - ``day_max``  — A4: ``np.max(matrix, axis=0)`` (clipping.py:56-57)
    - ``log_day_max`` — A5 (q=1.0 case): ``log(nanquantile(day, 1.0))``
      (capacity_change.py:47-52)
    - ``solar_noon_com`` — A12: energy center of mass
      ``sum(hod*v)/sum(v)`` (solar_noon.py:19-39)
    - ``sunrise`` / ``sunset`` — A13/W3: first/last hod above a capacity
      fraction (sunrise_sunset.py:11-27); ``solar_noon_rs`` midpoint
    - ``daylight_hours`` — A14: ``sunset - sunrise``
    - ``n_obs`` / ``n_null`` — infill accounting (A19/A20)

    Requires ``hod`` (fractional hour) on the input; the per-site capacity
    is computed once and broadcast back (tiny table).
    ``approx_capacity=True`` (the pipeline default) uses the mergeable
    ``percentile_approx`` sketch instead of the exact sort-based
    percentile — the right trade at fleet scale; oracle tests pin exact.

    ``sampling_col`` (per-site native cadences, the heterogeneous-fleet
    path): when given, the energy integral scales by each SITE's own
    sampling (``sum(v) * sampling/3600`` hours) instead of the global
    ``24/slots_per_day``.
    """
    cap = site_capacity(
        df, site_col=site_col, value_col=value_col, approx=approx_capacity
    )
    v = F.col(value_col)
    with_cap = df.join(F.broadcast(cap), on=site_col)
    sun_thresh = F.col("capacity") * F.lit(sun_threshold_frac)
    if sampling_col is not None:
        energy = (
            F.sum(v) * F.first(sampling_col) / F.lit(3600.0)
        ).alias("energy")
    else:
        energy = (
            F.sum(v) * F.lit(24.0) / F.lit(float(slots_per_day))
        ).alias("energy")

    return with_cap.groupBy(site_col, "date").agg(
        energy,
        F.avg(
            (v > F.lit(density_threshold) * F.col("capacity")).cast("int")
        ).alias("density"),
        F.max(v).alias("day_max"),
        F.log(F.max(v)).alias("log_day_max"),
        # try_divide: an all-zero/all-null day has an undefined center of
        # mass (NaN in the reference), not an ANSI division error
        F.try_divide(F.sum(F.col("hod") * v), F.sum(v)).alias("solar_noon_com"),
        F.min(F.when(v > sun_thresh, F.col("hod"))).alias("sunrise"),
        F.max(F.when(v > sun_thresh, F.col("hod"))).alias("sunset"),
        F.count(v).alias("n_obs"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).alias("n_null"),
        F.first("capacity").alias("capacity"),
    ).withColumn(
        "solar_noon_rs", (F.col("sunrise") + F.col("sunset")) / 2.0
    ).withColumn(
        "daylight_hours", F.col("sunset") - F.col("sunrise")
    )


def clipping_stats(
    df: DataFrame,
    site_col: str = "site",
    value_col: str = "value",
    near_max_frac: float = 0.995,
    exact_digits: int | None = None,
) -> DataFrame:
    """A9/A10 — per-day clipping statistics (clipping.py:54-68).

    - ``clip_stat_1`` = daily max / site max (A9)
    - ``clip_stat_2`` = fraction of daily energy delivered within 0.5% of
      the daily max (A10)

    Two-pass shape: daily max via one agg, joined back (co-partitioned on
    (site, date) so the second agg reuses the shuffle), site max broadcast.

    ``exact_digits`` (round 9): when set, clip_stat_2's numerator and
    denominator are order-free integer tick sums (``canonical.tick_sum``)
    — required on the certified path (q30): both are many-term float
    sums whose partition-parallel association can drift a ulp from the
    sequential oracle and flip the downstream rounding. clip_stat_1 is a
    ratio of two MAXes (order-free already) and needs no conversion.
    """
    v = F.col(value_col)
    day_max = df.groupBy(site_col, "date").agg(F.max(v).alias("day_max"))
    site_max = df.groupBy(site_col).agg(F.max(v).alias("site_max"))
    joined = df.join(day_max, on=[site_col, "date"]).join(
        F.broadcast(site_max), on=site_col
    )
    near = F.when(v >= F.lit(near_max_frac) * F.col("day_max"), v)
    if exact_digits is not None:
        clip2 = F.try_divide(
            tick_sum(near, exact_digits), tick_sum(v, exact_digits)
        )
    else:
        clip2 = F.try_divide(F.sum(near), F.sum(v))
    return joined.groupBy(site_col, "date").agg(
        # try_divide: a dead site (site_max == 0.0) must yield NULL
        # stats like the DuckDB mirror (x/0 -> NULL there), not an
        # ANSI divide-by-zero error killing the whole fleet job
        F.try_divide(F.first("day_max"), F.first("site_max")).alias(
            "clip_stat_1"
        ),
        clip2.alias("clip_stat_2"),
    )


def dataset_report(
    daily: DataFrame,
    site_col: str = "site",
    density_lo: float = 0.6,
    good_density: float = 0.8,
) -> DataFrame:
    """A8 + report — one row per site with dataset-level metrics.

    Parity: data_handler.py:718-840 (``report``) and :1232-1242 (quality /
    clearness scores = fraction of days passing flags). Flags here use the
    relational parts (density bounds); solver-based flags (clear-day fit)
    join in from the solver layer when enabled.
    """
    return daily.groupBy(site_col).agg(
        F.count("*").alias("num_days"),
        (F.count("*") / F.lit(365.2425)).alias("length_years"),
        F.first("capacity").alias("capacity"),
        F.avg((F.col("density") >= F.lit(good_density)).cast("int")).alias(
            "quality_score"
        ),
        F.avg("energy").alias("avg_daily_energy"),
        F.max("day_max").alias("max_power"),
    )


def doy_median_profile(
    df: DataFrame,
    site_col: str = "site",
    value_col: str = "value",
) -> DataFrame:
    """A15 — median across years per (day-of-year, slot) ("bundt" profile,
    data_handler.py:2496-2518). Feb-29 dropped for parity."""
    doy = F.dayofyear("date")
    no_leap = df.where(~((F.month("date") == 2) & (F.dayofmonth("date") == 29)))
    return (
        no_leap.groupBy(site_col, doy.alias("doy"), F.col("slot"))
        .agg(F.expr(f"percentile({value_col}, 0.5)").alias("median_value"))
    )


def binned_mean_pivot(
    df: DataFrame,
    x_col: str,
    y_col: str,
    value_col: str = "value",
    x_bin: float = 1.0,
    y_bin: float = 1.0,
    exact_digits: int | None = None,
) -> DataFrame:
    """A16 — mean of ``value`` grouped by rounded (x, y) bins
    (polar_transform.py:87-102). The pivot to a grid is presentation-side;
    the scalable artifact is the long (x_bin, y_bin, avg) table.

    ``exact_digits`` (round 9): when set, the mean is computed as an
    order-free integer tick sum (``canonical.tick_avg``) so the result
    is bit-equal across partition layouts and engines — REQUIRED when
    the output rides an oracle hash (certified q31; a float partial sum
    can land a ulp from a half-tick and flip the downstream rounding —
    the q148/q165 failure class)."""
    xb = (pround(F.col(x_col) / x_bin, 0) * x_bin).alias("x_bin")
    yb = (pround(F.col(y_col) / y_bin, 0) * y_bin).alias("y_bin")
    mean = (
        tick_avg(value_col, exact_digits)
        if exact_digits is not None
        else F.avg(value_col)
    )
    return df.groupBy(xb, yb).agg(mean.alias("avg_value"))


def rayleigh_statistic(
    df: DataFrame,
    angle_col: str,
    group_cols: list[str] | None = None,
    exact_digits: int | None = None,
) -> DataFrame:
    """A22/F11 — Rayleigh test statistic for circular uniformity
    (circular_statistics.py:14-99): mean resultant length R and z = n*R^2.

    Pure aggregation: sum(cos), sum(sin), count. The p-value approximation
    is scalar math on the aggregate row.

    ``exact_digits`` (round 9): when set, sum(cos)/sum(sin) — many-term
    float sums, the worst of the layout-drift offenders — are computed as
    order-free integer tick sums (``canonical.tick_sum``), and the
    downstream R/z arithmetic uses explicit multiplies (matching the
    oracle's ``sc*sc`` text rather than pow). REQUIRED for the certified
    path (q32)."""
    a = F.col(angle_col)
    g = group_cols or []
    if exact_digits is not None:
        agg = df.groupBy(*g).agg(
            tick_sum(F.cos(a), exact_digits).alias("sum_cos"),
            tick_sum(F.sin(a), exact_digits).alias("sum_sin"),
            F.count(a).alias("n"),
        )
        sc, ss = F.col("sum_cos"), F.col("sum_sin")
        R = F.sqrt(sc * sc + ss * ss) / F.col("n")
    else:
        agg = df.groupBy(*g).agg(
            F.sum(F.cos(a)).alias("sum_cos"),
            F.sum(F.sin(a)).alias("sum_sin"),
            F.count(a).alias("n"),
        )
        R = F.sqrt(
            F.col("sum_cos") ** 2 + F.col("sum_sin") ** 2
        ) / F.col("n")
    z = F.col("n") * R * R
    return agg.select(
        *g,
        F.col("n"),
        R.alias("resultant_length"),
        z.alias("rayleigh_z"),
    )
