"""Golden-fixture parity with the reference's own test data (SURVEY §5
implication 1): the reference repo ships a raw 5-min PV series and the
standardized series its pipeline produces
(tests/fixtures/data_transforms/timeseries*.csv). Our Spark
standardization must reproduce that golden output on the same input —
direct behavioral parity, not a self-produced regression fixture.

Tolerance policy mirrors the reference's own tests (atol 1e-3..2e-2 with
small mismatch budgets for edge semantics like duplicate-timestamp
tie-breaks).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

FIXTURES = "/root/reference/tests/fixtures/data_transforms"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{FIXTURES}/timeseries.csv"),
    reason="reference fixtures not available",
)


@pytest.fixture(scope="module")
def golden_pair(spark):
    from pyspark.sql import functions as F

    from solar_data_tools_spark.operators.time_axis import standardize_time_axis
    from solar_data_tools_spark.sources.readers import read_timeseries_csv

    raw = read_timeseries_csv(spark, f"{FIXTURES}/timeseries.csv")
    meas = raw.select(
        F.lit(1).alias("site"),
        F.col("ts"),
        F.monotonically_increasing_id().alias("seq"),
        F.col("ac_power_01").alias("value"),
    ).where(F.col("ts").isNotNull())
    std = (
        standardize_time_axis(meas, 300)
        .orderBy("grid_ts")
        .toPandas()
        .set_index("grid_ts")
    )

    golden = pd.read_csv(
        f"{FIXTURES}/timeseries_standardized.csv",
        index_col=0,
        parse_dates=True,
    )
    return std, golden


def test_standardized_grid_matches_reference_golden(golden_pair):
    std, golden = golden_pair
    # same regular grid: identical start, end, and length
    assert len(std) == len(golden), (len(std), len(golden))
    assert std.index.min() == golden.index.min()
    assert std.index.max() == golden.index.max()

    ours = std["value"].to_numpy(dtype=np.float64)
    theirs = golden["ac_power_01"].to_numpy(dtype=np.float64)
    both_nan = np.isnan(ours) & np.isnan(theirs)
    close = np.isclose(ours, theirs, atol=1e-6, equal_nan=False)
    agree = both_nan | close
    # exact parity achieved (all 55,584 slots): the operator reproduces
    # pandas reindex(nearest, limit=1) fill/tie semantics bit-for-bit
    assert agree.all(), (
        f"{(~agree).sum()} of {len(agree)} grid slots differ"
    )


def test_power_matrix_golden_shape(golden_pair):
    """The reference pivots the standardized series into a 288 x N day
    matrix (power_mat.csv). Our long-form equivalent must agree on the
    matrix geometry and column (day) energies."""
    std, _ = golden_pair
    mat = pd.read_csv(f"{FIXTURES}/power_mat.csv", header=None)
    assert mat.shape[0] == 288  # slots per day at 5-min

    df = std.reset_index()
    df["date"] = df.grid_ts.dt.date
    df["slot"] = (
        df.grid_ts.dt.hour * 12 + df.grid_ts.dt.minute // 5
    )
    # day count: golden matrix trims leading/trailing empty days; ours is
    # the full grid, so the golden days must be a contiguous subset
    assert mat.shape[1] <= df.date.nunique()
    # column energies of the overlapping days match (matrix column j is
    # day j of the trimmed range) — compare a stable statistic: total
    # energy of the densest 50 days
    daily_ours = df.groupby("date")["value"].sum().to_numpy()
    daily_theirs = np.nansum(mat.to_numpy(dtype=np.float64), axis=0)
    top_ours = np.sort(daily_ours[~np.isnan(daily_ours)])[-50:]
    top_theirs = np.sort(daily_theirs)[-50:]
    assert np.allclose(top_ours, top_theirs, rtol=1e-3), (
        top_ours[:3],
        top_theirs[:3],
    )
