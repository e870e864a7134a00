"""Plot-ready tables — the documented non-goal boundary for the
reference's plotting layer.

The reference ships a matplotlib layer (``solardatatools/plotting.py``
``plot_2d``/``plot_bundt_cake``; ``DataHandler.plot_*`` methods,
data_handler.py:1627-2570). Rendering figures is OUT OF SCOPE for a
query engine — but the DATA behind every reference plot must be (and
is) queryable. Each helper below returns exactly the table the
corresponding reference plot draws, so a user ports a plot by feeding
the helper's output to any charting tool. Each is a thin composition of
already-oracle-certified operators (the certifying query is named per
helper); none introduces new computation.

Rendering remains a deliberate non-goal: a 100 TB engine emits
plot-READY aggregates (bounded: days x slots per site), never pixels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heatmap_table(
    standardized: DataFrame,
    slots_per_day: int = 288,
    site_col: str = "site",
) -> DataFrame:
    """``plot_heatmap`` / ``plot_2d`` (plotting.py:9-74,
    data_handler.py:1627-1745): the day-matrix as a long table — one row
    per (site, date, slot, value); pivot slot x date client-side for the
    image. Certified by q27 (standardize grid) + q52/q56 (long -> wide
    pivot)."""
    us_per_slot = int(86_400_000_000 // slots_per_day)
    return standardized.select(
        site_col,
        F.to_date("grid_ts").alias("date"),
        (
            (
                F.unix_micros("grid_ts")
                - F.unix_micros(F.date_trunc("DAY", "grid_ts"))
            )
            / F.lit(us_per_slot)
        ).cast("int").alias("slot"),
        "value",
    )


def bundt_table(
    df: DataFrame,
    site_col: str = "site",
    value_col: str = "value",
) -> DataFrame:
    """``plot_bundt`` / ``plot_bundt_cake`` (plotting.py:75-150,
    data_handler.py:2467-2542): the median day profile per day-of-year —
    (site, doy, slot, median_value); the reference wraps this cylinder
    into its 3-D "bundt" ring. Certified by q39 (doy median profile).
    Input: the long measurement table with (date, slot) columns."""
    from solar_data_tools_spark.operators.daily import doy_median_profile

    return doy_median_profile(df, site_col=site_col, value_col=value_col)


def polar_transform_table(
    df: DataFrame,
    lat: float,
    lon: float,
    gmt_offset: float,
    value_col: str = "value",
    elevation_bin: float = 1.0,
    azimuth_bin: float = 2.0,
) -> DataFrame:
    """``plot_polar_transform`` (data_handler.py:2543-2570 +
    polar_transform.py): mean power binned by (solar azimuth, solar
    elevation) — the sky-dome view of the array response. Projects each
    measurement to sun position (declination + hour angle from the
    site's coordinates, the q70-certified geometry) and bins via the
    q31/q56-certified A16 aggregate. Input needs (date, hod, value).
    Returns (x_bin=azimuth_deg, y_bin=elevation_deg, avg_value)."""
    from solar_data_tools_spark.functions import solar as sol
    from solar_data_tools_spark.operators.daily import binned_mean_pivot

    doy = F.dayofyear("date")
    delta = F.radians(sol.delta_cooper(doy))
    solar_h = (
        F.col("hod")
        + (sol.eot_duffie(doy) + 4.0 * (F.lit(lon) - 15.0 * gmt_offset))
        / 60.0
    )
    omega = F.radians(sol.hour_angle(solar_h))
    phi = F.radians(F.lit(float(lat)))
    sin_el = (
        F.sin(phi) * F.sin(delta)
        + F.cos(phi) * F.cos(delta) * F.cos(omega)
    )
    el = F.degrees(F.asin(F.least(F.greatest(sin_el, F.lit(-1.0)), F.lit(1.0))))
    # azimuth from south, standard spherical triangle (sign of omega)
    cos_az = (
        (F.sin(delta) - F.sin(phi) * sin_el)
        / (F.cos(phi) * F.sqrt(F.lit(1.0) - sin_el * sin_el))
    )
    az = F.degrees(
        F.acos(F.least(F.greatest(cos_az, F.lit(-1.0)), F.lit(1.0)))
    ) * F.signum(omega)
    proj = df.select(
        az.alias("azimuth_deg"),
        el.alias("elevation_deg"),
        F.col(value_col),
    ).where(F.col("elevation_deg") > 0)
    return binned_mean_pivot(
        proj,
        "azimuth_deg",
        "elevation_deg",
        value_col=value_col,
        x_bin=azimuth_bin,
        y_bin=elevation_bin,
    )


def daily_signals_table(scores: DataFrame) -> DataFrame:
    """``plot_daily_signals`` family — density (:1877), data-quality
    scatter (:1991), daily energy (:2028), clipping (:2102): every one
    of those panels draws columns of the per-(site, date) score table
    that ``daily_quality_scores`` / the fleet facade already emit.
    Certified by q87 (rows-only) and the reference scoring goldens.
    This helper is the identity on that table, kept so each reference
    plot name maps to a documented source."""
    return scores


def cdf_table(
    df: DataFrame,
    site_col: str = "site",
) -> DataFrame:
    """``plot_daily_max_cdf`` / ``plot_cdf_analysis``
    (data_handler.py:2154-2214): the empirical CDF of the daily max.
    Certified by q37 (CDF + resample). Returns (site, day_max, cdf)."""
    from pyspark.sql import Window

    daily = df.groupBy(site_col, "date").agg(
        F.max("value").alias("day_max")
    )
    n = daily.groupBy(site_col).agg(F.count("*").alias("_n"))
    w = Window.partitionBy(site_col).orderBy("day_max")
    return (
        daily.withColumn("_rank", F.row_number().over(w))
        .join(F.broadcast(n), site_col)
        .select(
            site_col,
            "day_max",
            (F.col("_rank") / F.col("_n")).alias("cdf"),
        )
    )
