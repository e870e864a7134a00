"""End-to-end solar-semantics test on a synthetic PV fleet.

The oracle-gate queries run on the generic events table; this test feeds
the engine what it was actually built for — bell-curve PV days at 5-min
sampling — with planted ground truth per site:

  site 1: clean baseline
  site 2: inverter limit at 88% of nameplate — sunny days flat-top AT the
          limit (a point mass at the top of the daily-max distribution,
          which is what inverter clipping looks like); cloudy days stay
          below it
  site 3: +1 h clock shift from day 60 onward
  site 4: 30% capacity drop from day 60 onward

and asserts each detector finds its planted artifact and nothing else
finds a phantom. This mirrors the reference's golden-fixture strategy
(SURVEY §5) with an independent generator instead of self-produced
goldens.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

N_DAYS = 120
SLOTS = 288  # 5-min
SHIFT_DAY = 60
INVERTER_LIMIT = 0.88  # site 2: fraction of nameplate
# site 2: sunny days (reach the limit) vs cloudy days (stay below)
SUNNY = {d for d in range(N_DAYS) if d % 3 != 0}


def _bell(slots: np.ndarray, noon_slot: float, cap: float) -> np.ndarray:
    width = SLOTS / 10.0  # sigma 2.4 h: tails die before the day boundary
    prof = cap * np.exp(-0.5 * ((slots - noon_slot) / width) ** 2)
    prof[prof < cap * 0.01] = 0.0
    return prof


def make_fleet() -> pd.DataFrame:
    rng = np.random.default_rng(123)
    rows = []
    slots = np.arange(SLOTS)
    for site in (1, 2, 3, 4):
        for d in range(N_DAYS):
            cap = 100.0
            noon = SLOTS / 2
            if site == 2 and d not in SUNNY:
                cap *= 0.65  # cloudy day: below the inverter limit
            if site == 3 and d >= SHIFT_DAY:
                noon += 12  # +1 h clock shift (12 five-min slots)
            if site == 4 and d >= SHIFT_DAY:
                cap *= 0.7  # capacity drop
            day = _bell(slots, noon, cap) * (1 + rng.normal(0, 0.02, SLOTS))
            day = np.maximum(day, 0.0)
            if site == 2:
                day = np.minimum(day, INVERTER_LIMIT * 100.0)
            date = pd.Timestamp("2024-01-01") + pd.Timedelta(days=d)
            ts = date + pd.to_timedelta(slots * 5, unit="m")
            rows.append(
                pd.DataFrame(
                    {
                        "site": site,
                        "ts": ts,
                        "seq": np.arange(SLOTS) + d * SLOTS,
                        "value": day,
                    }
                )
            )
    return pd.concat(rows, ignore_index=True)


@pytest.fixture(scope="module")
def fleet_daily(spark):
    from solar_data_tools_spark.operators.canonical import with_time_columns

    pdf = make_fleet()
    meas = with_time_columns(spark.createDataFrame(pdf), sampling_seconds=300)
    d2 = __import__(
        "solar_data_tools_spark.operators.windows", fromlist=["second_diff"]
    ).second_diff(meas)
    daily = d2.groupBy("site", "date").agg(
        (F.sum("value") * 24.0 / SLOTS).alias("energy"),
        F.sum(F.abs(F.col("diff2"))).alias("smoothness_l1"),
        F.log(F.max("value")).alias("log_day_max"),
        (F.sum(F.col("hod") * F.col("value")) / F.sum("value")).alias(
            "solar_noon_com"
        ),
    )
    return meas.cache(), daily.cache()


def test_clipping_detector_finds_planted_days(spark, fleet_daily):
    from solar_data_tools_spark.algorithms.daily_flags import detect_clipping
    from solar_data_tools_spark.operators.daily import clipping_stats

    meas, _ = fleet_daily
    stats = clipping_stats(meas)
    out = detect_clipping(stats).toPandas()
    out["day_ix"] = (pd.to_datetime(out.date) - pd.Timestamp("2024-01-01")).dt.days

    s2 = out[out.site == 2]
    sunny = s2[s2.day_ix.isin(SUNNY)]
    cloudy = s2[~s2.day_ix.isin(SUNNY)]
    clean_site = out[out.site == 1]
    # sunny (limit-hitting) days flagged; cloudy days and the clean site not
    assert sunny.clipped.mean() >= 0.9, sunny.clipped.mean()
    assert cloudy.clipped.mean() <= 0.1, cloudy.clipped.mean()
    assert clean_site.clipped.mean() <= 0.2, clean_site.clipped.mean()


def test_time_shift_detector_finds_planted_shift(spark, fleet_daily):
    from solar_data_tools_spark.algorithms.daily_flags import detect_time_shifts

    _, daily = fleet_daily
    out = detect_time_shifts(daily, w1=0.5, min_shift_hours=0.25).toPandas()
    out["day_ix"] = (pd.to_datetime(out.date) - pd.Timestamp("2024-01-01")).dt.days

    s3 = out[out.site == 3]
    pre = s3[s3.day_ix < SHIFT_DAY - 2]
    post = s3[s3.day_ix > SHIFT_DAY + 2]
    assert pre.shift_hours.abs().max() < 0.05
    assert abs(post.shift_hours.mean() + 1.0) < 0.15, post.shift_hours.mean()
    # no phantom shifts on the other sites
    others = out[out.site != 3]
    assert others.shift_hours.abs().max() < 0.05


def test_capacity_detector_finds_planted_drop(spark, fleet_daily):
    from solar_data_tools_spark.algorithms.daily_flags import (
        detect_capacity_changes,
    )

    _, daily = fleet_daily
    out = detect_capacity_changes(daily, w1=0.5).toPandas()
    out["day_ix"] = (pd.to_datetime(out.date) - pd.Timestamp("2024-01-01")).dt.days

    s4 = out[out.site == 4].sort_values("day_ix")
    changes = s4[s4.cap_changed]
    assert len(changes) == 1
    assert abs(int(changes.day_ix.iloc[0]) - SHIFT_DAY) <= 2
    # clean site: exactly one regime, no changes
    s1 = out[out.site == 1]
    assert not s1.cap_changed.any()
    # clipping site: clipped days cap the max but shouldn't create a
    # persistent regime change
    s2 = out[out.site == 2]
    assert s2.capacity_label.nunique() <= 3


def test_report_capacity_and_quality(spark, fleet_daily):
    from solar_data_tools_spark.operators.daily import (
        daily_statistics,
        dataset_report,
    )

    meas, _ = fleet_daily
    daily = daily_statistics(meas, slots_per_day=SLOTS)
    rep = dataset_report(daily).toPandas().set_index("site")
    # capacity ~ 95th pct of a 100-peak bell with many zero slots; site 4's
    # is pulled down by the drop
    assert rep.loc[1, "capacity"] == pytest.approx(
        rep.loc[2, "capacity"], rel=0.25
    )
    assert rep.loc[4, "capacity"] < rep.loc[1, "capacity"]
    assert (rep.num_days == N_DAYS).all()


def test_end_to_end_correction_roundtrip(spark, fleet_daily):
    """Detect the site-3 shift and APPLY it: after correction, the rolled
    solar noon (in slot space) realigns with the pre-shift noon."""
    from solar_data_tools_spark.algorithms.daily_flags import (
        apply_time_shift_correction,
        detect_time_shifts,
    )

    meas, daily = fleet_daily
    shifts = detect_time_shifts(daily, w1=0.5, min_shift_hours=0.25)
    corrected = apply_time_shift_correction(meas, shifts, slots_per_day=SLOTS)
    new_noon = (
        corrected.where(F.col("site") == 3)
        .groupBy("date")
        .agg(
            (F.sum(F.col("slot") * F.col("value")) / F.sum("value")).alias(
                "noon_slot"
            )
        )
        .toPandas()
    )
    new_noon["day_ix"] = (
        pd.to_datetime(new_noon.date) - pd.Timestamp("2024-01-01")
    ).dt.days
    pre = new_noon[new_noon.day_ix < SHIFT_DAY - 2].noon_slot.mean()
    post = new_noon[new_noon.day_ix > SHIFT_DAY + 2].noon_slot.mean()
    assert abs(pre - post) < 1.5, (pre, post)
