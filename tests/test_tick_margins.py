"""Tick-margin audit for certified TRANSCENDENTAL projections.

The round-8/9 determinism work made every certified aggregate an
integer tick sum and every rounding the portable floor pattern — fully
layout-independent, and engine-exact for +-*/ arithmetic (IEEE ops are
bit-identical given identical operands). The one residual cross-engine
risk class is transcendental INPUTS: Spark (JVM StrictMath-accurate,
<=1 ulp) and DuckDB (C libm) may return doubles a ulp apart for the
same argument of cos/sin/exp/..., and a per-term quantization
``floor(v * 10^d + 0.5)`` flips by one tick iff ``v`` lands within that
ulp of a tick boundary.

This audit makes the risk EMPIRICAL for the driver's gate data: for
every certified projection that feeds a transcendental into
``ticks``/``pround`` at digits=6, compute the distance of
``v * 1e6 + 0.5`` to its nearest integer boundary over ALL rows at
sf0.01 (the external gate's scale) and assert the minimum margin is
>= 1e-7 — three-plus orders of magnitude above the ~1e-10 scaled-ulp
divergence libm implementations can exhibit for |v| <= 100. A failure
here means a certified query is one unlucky libm ulp away from a
driver red and must move to a coarser digit or a rational
reformulation (it does NOT mean the current gate is red — the parity
suite checks that directly)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solar_data_tools_spark.functions import solar as sol
from solar_data_tools_spark.session import read_table

MIN_MARGIN = 1e-7
DIGITS = 6


def _min_margin(df, col):
    """Min distance of col*10^d + 0.5 to the nearest integer boundary."""
    x = col * F.lit(float(10**DIGITS)) + F.lit(0.5)
    frac = x - F.floor(x)
    margin = F.least(frac, F.lit(1.0) - frac)
    return df.agg(F.min(margin).alias("m")).collect()[0]["m"]


@pytest.fixture(scope="module")
def sf_gate():
    return "/root/testdata/sf0.01"


def test_q32_cos_sin_term_margins(spark, sf_gate):
    """q32's certified tick terms: cos/sin of the event time-of-day
    angle (registry.py::q32_rayleigh)."""
    ev = read_table(spark, f"{sf_gate}/events.parquet")
    angle = (
        (F.floor(F.unix_micros("ts") / 1_000_000) % 86400)
        / 86400.0
        * 2.0
        * 3.141592653589793
    )
    a = ev.select(angle.alias("angle"))
    for name, term in (("cos", F.cos("angle")), ("sin", F.sin("angle"))):
        m = _min_margin(a, term)
        assert m >= MIN_MARGIN, f"q32 {name} margin {m}"


def test_q33_solar_function_margins(spark, sf_gate):
    """q33's certified per-row projections: equation-of-time (two
    flavours), Cooper declination, daylight hours — all sin/cos
    compositions over day-of-year."""
    li = read_table(spark, f"{sf_gate}/lineitem.parquet")
    doys = li.select(F.dayofyear("l_shipdate").alias("doy")).distinct()
    exprs = {
        "eot_duffie": sol.eot_duffie(F.col("doy")),
        "eot_da_rosa": sol.eot_da_rosa(F.col("doy")),
        "delta_cooper": sol.delta_cooper(F.col("doy")),
        "daylight_hours": sol.num_daylight_hours(
            37.45, sol.delta_cooper(F.col("doy"))
        ),
    }
    for name, e in exprs.items():
        m = _min_margin(doys, e)
        assert m >= MIN_MARGIN, f"q33 {name} margin {m}"


def test_q70_cos_theta_margin(spark, sf_gate):
    """q70's certified cos-theta geometry projection (F5/F6/F9)."""
    li = read_table(spark, f"{sf_gate}/lineitem.parquet")
    doys = li.select(F.dayofyear("l_shipdate").alias("doy")).distinct()
    delta = sol.delta_cooper(F.col("doy"))
    hours = doys.crossJoin(
        spark.range(6, 19).select(
            (F.col("id").cast("double") - 12.0).alias("solar_hour")
        )
    )
    omega = sol.hour_angle(F.col("solar_hour"))
    ct = sol.cos_theta(
        delta, omega, lat_deg=37.45, tilt_deg=20.0, azimuth_deg=0.0
    )
    m = _min_margin(hours, ct)
    assert m >= MIN_MARGIN, f"q70 cos_theta margin {m}"
