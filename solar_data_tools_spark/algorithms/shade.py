"""Shade analysis (SURVEY §2.8 D8 + §2.5 A17; reference:
solardatatools/algorithms/shade.py).

Pipeline parity:
  1. **transform_data** (shade.py:323-349): clear days are normalized onto
     a (solar-declination bin x daylight-fraction) grid — here via the
     dilation operator (each day resampled between sunrise and sunset)
     followed by a mean aggregation per (delta bin, fraction slot). Pure
     DataFrame ops up to this point.
  2. **decomposition** (shade.py:351-410): the reference fits
     clear-sky (PCA basis, smooth, concave rows) + shade (>= 0, smooth,
     sparse) with cvxpy. Here: per-site alternating fit — clear-sky = a
     smooth concave upper envelope per declination row (isotonic-bitonic
     smoothing), shade = the nonnegative relative deficit below it. The
     grid is ~tens x 64 per site, so the solve is a trivial grouped-map
     task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from solar_data_tools_spark.shipping import ensure_package_on_executors


def _concave_envelope(row: np.ndarray) -> np.ndarray:
    """Clear-sky envelope of one declination row: the upper CONCAVE hull
    of the (lightly smoothed) profile — the shape constraint the reference
    imposes as 'concave rows'. Unlike a monotone sweep, the hull bridges
    straight across shade notches, which is exactly what makes the deficit
    below it attributable to shade.

    The hull is built on the raw row (the row is already a mean over many
    days, so day-level noise is averaged out); pre-smoothing would drag
    the envelope below the observations near sharp notches."""
    s = np.asarray(row, dtype=np.float64)
    n = len(s)
    x = np.arange(n, dtype=np.float64)
    # Andrew's monotone chain, upper hull
    hull: list[int] = []
    for i in range(n):
        while len(hull) >= 2:
            x1, x2 = hull[-2], hull[-1]
            # pop while the turn is not convex-from-above
            cross = (x[x2] - x[x1]) * (s[i] - s[x1]) - (x[i] - x[x1]) * (
                s[x2] - s[x1]
            )
            if cross >= 0:
                hull.pop()
            else:
                break
        hull.append(i)
    return np.interp(x, x[hull], s[hull])


def shade_grid(
    dilated: DataFrame,
    site_col: str = "site",
    delta_bin_size: float = 2.0,
) -> DataFrame:
    """Step 1 — mean normalized power per (site, declination bin,
    daylight-fraction slot) over the dilated clear-day table.

    Input: (site, date, dil_slot, dil_value). One aggregation; the
    declination is a native expression of day-of-year (F3).
    """
    from solar_data_tools_spark.functions.solar import delta_cooper

    delta = delta_cooper(F.dayofyear("date"))
    day_max = F.max("dil_value").over(Window.partitionBy(site_col, "date"))
    normalized = dilated.withColumn(
        "norm_value",
        F.when(day_max > 0, F.col("dil_value") / day_max).otherwise(0.0),
    ).withColumn("delta_bin", F.round(delta / delta_bin_size) * delta_bin_size)
    return normalized.groupBy(site_col, "delta_bin", "dil_slot").agg(
        F.avg("norm_value").alias("observed"), F.count("*").alias("n_days")
    )


def decompose_shade(
    grid: DataFrame,
    site_col: str = "site",
    shade_threshold: float = 0.1,
) -> DataFrame:
    """Step 2 — per-site clear-sky envelope + nonnegative shade deficit.

    Output: (site, delta_bin, dil_slot, observed, clearsky, shade_frac,
    is_shaded).
    """
    ensure_package_on_executors(grid.sparkSession)
    site_dtype = dict(grid.dtypes)[site_col]
    st = "string" if site_dtype == "string" else "long"
    schema = (
        f"{site_col} {st}, delta_bin double, dil_slot int, observed double, "
        "clearsky double, shade_frac double, is_shaded boolean"
    )

    def _decompose(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for db, rowdf in pdf.groupby("delta_bin"):
            rowdf = rowdf.sort_values("dil_slot")
            obs = rowdf["observed"].to_numpy(dtype=np.float64)
            clear = _concave_envelope(obs)
            with np.errstate(invalid="ignore", divide="ignore"):
                deficit = np.where(clear > 1e-9, (clear - obs) / clear, 0.0)
            deficit = np.clip(deficit, 0.0, 1.0)
            out.append(
                pd.DataFrame(
                    {
                        site_col: rowdf[site_col].iloc[0],
                        "delta_bin": db,
                        "dil_slot": rowdf["dil_slot"].to_numpy(),
                        "observed": obs,
                        "clearsky": clear,
                        "shade_frac": deficit,
                        "is_shaded": deficit >= shade_threshold,
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    from solar_data_tools_spark.parallel import partition_for_grouped_map

    return (
        partition_for_grouped_map(
            grid.select(site_col, "delta_bin", "dil_slot", "observed"), [site_col]
        )
        .groupBy(site_col)
        .applyInPandas(_decompose, schema)
    )
