"""Property-based tests (hypothesis) for operators whose correctness is a
relation over arbitrary inputs, not a fixed fixture: gap-fill bounds,
session partitioning, as-of nearest choice, TV optimality. Spark round
trips are slow, so examples are few but adversarially shrunk."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def series_with_gaps(draw):
    n = draw(st.integers(5, 40))
    vals = draw(
        st.lists(
            st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
            min_size=n,
            max_size=n,
        )
    )
    return vals


@given(series_with_gaps())
@settings(**SET)
def test_gap_fill_bounds_and_identity(spark, vals):
    """Filled values lie within [min, max] of the two bracketing known
    values; non-null inputs pass through unchanged; leading nulls stay
    null."""
    from solar_data_tools_spark.operators.windows import gap_fill_linear

    ts0 = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "site": 1,
            "ts": [ts0 + pd.Timedelta(minutes=5 * i) for i in range(len(vals))],
            "seq": range(len(vals)),
            "value": vals,
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        gap_fill_linear(df).orderBy("seq").select("seq", "value", "value_filled")
    ).toPandas()

    known = [(i, v) for i, v in enumerate(vals) if v is not None]
    for _, row in out.iterrows():
        i, v, f = int(row["seq"]), row["value"], row["value_filled"]
        if v is not None and not pd.isna(v):
            assert f == v  # identity on knowns
            continue
        before = [kv for kv in known if kv[0] < i]
        after = [kv for kv in known if kv[0] > i]
        if not before:
            assert pd.isna(f)  # leading gap stays null
        elif not after:
            assert f == before[-1][1]  # trailing gap forward-fills
        else:
            lo = min(before[-1][1], after[0][1])
            hi = max(before[-1][1], after[0][1])
            assert lo - 1e-9 <= f <= hi + 1e-9


@given(
    st.lists(st.integers(0, 10_000), min_size=2, max_size=40),
    st.integers(60, 3600),
)
@settings(**SET)
def test_sessionize_partitions_events(spark, offsets_s, gap):
    """Sessions partition the events; within-session gaps <= gap; the gap
    between consecutive sessions > gap."""
    from solar_data_tools_spark.operators.sessions import sessionize

    ts0 = pd.Timestamp("2024-01-01")
    times = sorted(ts0 + pd.Timedelta(seconds=o) for o in offsets_s)
    pdf = pd.DataFrame(
        {"site": 1, "ts": times, "seq": range(len(times)), "value": 1.0}
    )
    out = (
        sessionize(spark.createDataFrame(pdf), gap_seconds=gap)
        .orderBy("session_id")
        .toPandas()
    )
    assert out.n_events.sum() == len(times)  # partition: no loss, no dup
    for i in range(1, len(out)):
        between = (
            out.session_start.iloc[i] - out.session_end.iloc[i - 1]
        ).total_seconds()
        assert between > gap  # distinct sessions are separated
    # within each session the span is consistent with <= gap steps
    for _, r in out.iterrows():
        span = (r.session_end - r.session_start).total_seconds()
        assert span <= gap * max(r.n_events - 1, 0) + 1e-9


@given(
    st.lists(st.integers(0, 86_400), min_size=1, max_size=15),
    st.integers(0, 86_400),
    st.integers(30, 7200),
)
@settings(**SET)
def test_asof_nearest_picks_true_nearest(spark, right_offsets, left_offset, tol):
    from solar_data_tools_spark.operators.joins import asof_nearest_join

    ts0 = pd.Timestamp("2024-01-01")
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "ts": [ts0 + pd.Timedelta(seconds=left_offset)]})
    )
    rs = sorted(set(right_offsets))
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": 1,
                "ts": [ts0 + pd.Timedelta(seconds=o) for o in rs],
                "v": [float(o) for o in rs],
            }
        )
    )
    row = asof_nearest_join(left, right, on="k", tolerance_seconds=tol).collect()[0]
    dists = [(abs(o - left_offset), o) for o in rs]
    best = min(dists)
    if best[0] <= tol:
        assert row["v"] == float(best[1]), (row, best)
    else:
        assert row["v"] is None


@given(
    st.lists(st.floats(-50, 50, allow_nan=False), min_size=3, max_size=200),
    st.floats(0.01, 20.0),
)
@settings(max_examples=50, deadline=None)
def test_tv_denoise_is_locally_optimal(y_list, lam):
    """The TV objective at the solution beats random perturbations — the
    defining property of the exact solver, checked on arbitrary signals."""
    from solar_data_tools_spark.solvers.tv import tv1d_denoise

    y = np.array(y_list)
    x = tv1d_denoise(y, lam)

    def obj(z):
        return 0.5 * np.sum((y - z) ** 2) + lam * np.sum(np.abs(np.diff(z)))

    base = obj(x)
    rng = np.random.default_rng(0)
    for _ in range(20):
        assert obj(x + rng.normal(0, 1e-4, len(x))) >= base - 1e-8
