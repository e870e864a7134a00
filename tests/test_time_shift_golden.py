"""Time-shift golden round-trip against the reference's published
fixtures (reference tests/solardatatools/test_fix_time_shifts.py:13-40):
two-year 15-min matrix with a planted 1-hour clock shift -> detect ->
roll -> must equal two_year_signal_fixed.csv at decimal=3."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

FIX = "/root/reference/tests/fixtures/time_shifts"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{FIX}/two_year_signal_with_shift.csv"),
    reason="reference fixtures not available",
)


@pytest.fixture(scope="module")
def fixture_data():
    mat = np.loadtxt(f"{FIX}/two_year_signal_with_shift.csv", delimiter=",")
    fixed = np.loadtxt(f"{FIX}/two_year_signal_fixed.csv", delimiter=",")
    use = np.loadtxt(f"{FIX}/clear_days.csv", delimiter=",").astype(bool)
    return mat, fixed, use


def test_numpy_core_roundtrip_exact(fixture_data):
    from solar_data_tools_spark.algorithms.time_shift import (
        detect_time_shifts_from_noon,
        energy_com,
    )

    mat, fixed, use = fixture_data
    metric = energy_com(mat)
    out = detect_time_shifts_from_noon(
        metric, use_ixs=use, w1=75, slots_per_day=mat.shape[0]
    )
    roll = out["roll_by_index"]
    D = mat.copy()
    for r in np.unique(roll):
        if r != 0:
            D[:, roll == r] = np.roll(mat, int(r), axis=0)[:, roll == r]
    np.testing.assert_almost_equal(D, fixed, decimal=3)
    # the planted shift: days 162+ rolled back by 4 slots (1 h at 15-min)
    assert list(out["transitions"]) == [162]
    assert set(np.unique(roll)) == {0.0, 4.0}


def test_spark_long_table_roundtrip(spark, fixture_data):
    """Same golden through the fleet path: long table -> daily noon agg ->
    grouped-map detection -> W6 circular roll."""
    from pyspark.sql import functions as F

    from solar_data_tools_spark.algorithms.time_shift import fix_time_shifts

    mat, fixed, use = fixture_data
    slots, ndays = mat.shape
    day_ix, slot_ix = np.meshgrid(np.arange(ndays), np.arange(slots))
    pdf = pd.DataFrame(
        {
            "site": 1,
            "date": pd.Timestamp("2020-01-01")
            + pd.to_timedelta(day_ix.ravel(), unit="D"),
            "slot": slot_ix.ravel(),
            "value": mat.ravel(order="F")[
                (day_ix * slots + slot_ix).ravel()
            ],
            "use_day": use[day_ix.ravel()],
        }
    )
    pdf["hod"] = pdf.slot * 24.0 / slots
    meas = spark.createDataFrame(pdf)
    out = fix_time_shifts(
        meas, slots_per_day=slots, w1=75, use_flag_col="use_day"
    ).toPandas()
    got = np.full((slots, ndays), np.nan)
    day_num = (pd.to_datetime(out.date) - pd.Timestamp("2020-01-01")).dt.days
    got[out.slot.to_numpy(), day_num.to_numpy()] = out.value.to_numpy()
    np.testing.assert_almost_equal(got, fixed, decimal=3)
