"""T5 golden test: fix_dst parity with the reference's DST correction.

Reference semantics (time_axis_manipulation.py:255-267,
fix_daylight_savings_with_known_tz): tz_localize(tz, nonexistent="NaT",
ambiguous="NaT") -> tz_convert to the zone's fixed STANDARD offset
(Etc/GMT+N) -> strip tz. The Spark operator expresses the same mapping
with built-ins: to_utc_timestamp(ts, tz) + standard offset.

Edge-hour policy difference (asserted below, not hidden): pandas NaTs
the nonexistent spring-forward hour and the ambiguous fall-back hour;
Spark's to_utc_timestamp maps both deterministically (gap hours shift
forward, ambiguous hours take the pre-transition offset). Every other
timestamp must match EXACTLY.
"""

import datetime

import pandas as pd
import pytest


TZ = "America/Los_Angeles"
STD_OFFSET_HOURS = -8  # PST, the zone's standard (non-DST) offset


def reference_fix_dst(naive_index: pd.DatetimeIndex) -> pd.DatetimeIndex:
    """The reference's localize -> convert-to-standard -> strip chain."""
    return (
        naive_index.tz_localize(TZ, nonexistent="NaT", ambiguous="NaT")
        .tz_convert("Etc/GMT+8")
        .tz_localize(None)
    )


@pytest.fixture(scope="module")
def spans():
    # 30-min grid across the 2024 US spring-forward (Mar 10 02:00) and
    # fall-back (Nov 3 02:00) transitions, plus plain winter/summer days
    idx = pd.date_range("2024-03-09", "2024-03-12", freq="30min").append(
        pd.date_range("2024-11-02", "2024-11-05", freq="30min")
    ).append(pd.date_range("2024-01-15", "2024-01-16", freq="30min")).append(
        pd.date_range("2024-07-15", "2024-07-16", freq="30min")
    )
    return idx


def test_fix_dst_matches_reference_semantics(spark, spans):
    from solar_data_tools_spark.operators.time_axis import fix_dst

    pdf = pd.DataFrame({"ts": spans, "value": range(len(spans))})
    sdf = spark.createDataFrame(pdf)
    out = (
        fix_dst(sdf, TZ, STD_OFFSET_HOURS)
        .toPandas()
        .sort_values("value")
        .reset_index(drop=True)
    )
    ref = reference_fix_dst(pd.DatetimeIndex(spans))

    valid = ~ref.isna()
    assert valid.sum() > 0.9 * len(ref)  # only edge hours are NaT
    got = pd.DatetimeIndex(out["ts"])
    mismatch = got[valid] != ref[valid]
    assert not mismatch.any(), (
        f"{mismatch.sum()} non-edge timestamps diverge from the reference "
        f"localize->convert->strip chain, e.g. "
        f"{list(zip(spans[valid][mismatch][:3], got[valid][mismatch][:3], ref[valid][mismatch][:3]))}"
    )


def test_fix_dst_winter_identity_summer_shift(spark, spans):
    """In winter (already standard time) the correction is the identity;
    in summer (DST) every timestamp moves back exactly one hour."""
    from solar_data_tools_spark.operators.time_axis import fix_dst

    winter = pd.date_range("2024-01-15", periods=24, freq="1h")
    summer = pd.date_range("2024-07-15", periods=24, freq="1h")
    pdf = pd.DataFrame(
        {"ts": winter.append(summer), "value": range(48)}
    )
    out = (
        fix_dst(spark.createDataFrame(pdf), TZ, STD_OFFSET_HOURS)
        .toPandas()
        .sort_values("value")
        .reset_index(drop=True)
    )
    got = pd.DatetimeIndex(out["ts"])
    assert (got[:24] == winter).all()
    assert (got[24:] == summer - datetime.timedelta(hours=1)).all()


def test_fix_dst_edge_hours_deterministic(spark):
    """Documented deviation: the nonexistent spring-forward hour maps
    forward (not NaT) and stays on the grid — no rows are lost."""
    from solar_data_tools_spark.operators.time_axis import fix_dst

    gap = pd.date_range("2024-03-10 02:00", periods=2, freq="30min")
    pdf = pd.DataFrame({"ts": gap, "value": [0, 1]})
    out = (
        fix_dst(spark.createDataFrame(pdf), TZ, STD_OFFSET_HOURS)
        .toPandas()
        .sort_values("value")
        .reset_index(drop=True)
    )
    assert out["ts"].notna().all()
    assert len(out) == 2
