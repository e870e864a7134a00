"""Plot-ready-table helpers: each reference plot maps to a certified
query; these tests pin the table shapes and basic invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from solar_data_tools_spark import plotting as pl


def _std(spark, n_days=3, slots=96):
    hod = np.arange(slots) * 24.0 / slots
    bell = np.clip(np.sin((hod - 6.0) / 12.0 * np.pi), 0.0, None)
    rows = []
    for d in range(n_days):
        base = pd.Timestamp("2024-06-01") + pd.Timedelta(days=d)
        for i in range(slots):
            rows.append((1, base + pd.Timedelta(minutes=15 * i), float(bell[i])))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["site", "grid_ts", "value"])
    )


def test_heatmap_table_shape(spark):
    std = _std(spark, n_days=3, slots=96)
    out = pl.heatmap_table(std, slots_per_day=96).toPandas()
    assert len(out) == 3 * 96
    assert set(out.columns) == {"site", "date", "slot", "value"}
    assert out.slot.min() == 0 and out.slot.max() == 95
    # pivot round-trip: each (date, slot) is unique
    assert not out.duplicated(["site", "date", "slot"]).any()


def test_bundt_table_is_doy_profile(spark):
    std = _std(spark, n_days=3, slots=96)
    meas = pl.heatmap_table(std, slots_per_day=96)
    out = pl.bundt_table(meas).toPandas()
    assert set(out.columns) == {"site", "doy", "slot", "median_value"}
    # one row per (doy, slot) present in the input
    assert len(out) == 3 * 96


def test_polar_transform_bins(spark):
    std = _std(spark, n_days=3, slots=96)
    meas = pl.heatmap_table(std, slots_per_day=96).withColumn(
        "hod", F.col("slot") * (24.0 / 96)
    )
    out = pl.polar_transform_table(
        meas, lat=37.0, lon=-122.0, gmt_offset=-8.0
    ).toPandas()
    assert len(out) > 0
    # daytime only: elevation > 0 pre-binning (a bin can round to 0)
    assert (out.y_bin >= 0).all()
    assert (out.y_bin > 0).any()
    assert np.isfinite(out.avg_value).all()
    # the sun crosses the meridian: both morning (az<0) and afternoon
    assert (out.x_bin < 0).any() and (out.x_bin > 0).any()


def test_cdf_table_monotone(spark):
    std = _std(spark, n_days=5, slots=96)
    meas = pl.heatmap_table(std, slots_per_day=96)
    out = (
        pl.cdf_table(meas.select("site", "date", "value"))
        .orderBy("day_max")
        .toPandas()
    )
    assert len(out) == 5
    assert (np.diff(out.cdf) >= 0).all()
    assert out.cdf.iloc[-1] == 1.0
