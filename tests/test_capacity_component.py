"""D6 capacity-change component + degradation options.

Reference parity targets: loss_factor_analysis.py:447-556 — the loss
model includes a capacity-change term built from detected regime labels
(one-hot Basis + nonpositivity + tiny SumAbs, :536-550) and degradation
options {linear, monotone ("nonlinear"), none, fixed-rate} (:487-533).
The repo solves the same identification with an envelope quantile
regression (pinball tau=0.9, the reference's SumQuantile loss) over
[trend, Fourier, capacity-regime indicators] followed by the sawtooth
soiling fit on the residual.

The planted-fleet test is the wrong-answer guard the round-4 review
asked for: a persistent capacity step must land in the capacity
component, NOT in soiling or degradation.
"""

import numpy as np
import pytest


def _planted_series(
    n=730,
    deg_rate_pct=-1.0,
    step_day=500,
    step_log=-0.15,
    seed=3,
    soil_slope=0.001,
    clean_p=0.04,
):
    """Log daily energy: baseline + seasonal + linear degradation +
    sawtooth soiling (rain-cleaned every ~25 days) + a capacity step at
    ``step_day`` + noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    years = t / 365.2425
    seasonal = 0.08 * np.sin(2 * np.pi * t / 365.2425)
    deg = np.log(1.0 + deg_rate_pct / 100.0) * years
    soil = np.zeros(n)
    lvl = 0.0
    for i in range(n):
        lvl -= soil_slope
        if rng.random() < clean_p:
            lvl = 0.0
        soil[i] = lvl
    cap = np.where(t >= step_day, step_log, 0.0)
    log_e = 1.0 + seasonal + deg + soil + cap + 0.01 * rng.standard_normal(n)
    labels = (t >= step_day).astype(int)
    return log_e, labels, deg, soil, cap


def test_capacity_step_lands_in_capacity_component():
    from solar_data_tools_spark.algorithms.loss_factors import (
        fit_loss_components,
    )

    log_e, labels, deg_true, soil_true, cap_true = _planted_series()
    energy = np.exp(log_e)

    with_cap = fit_loss_components(energy, capacity_labels=labels)
    # capacity component recovers the step: ~step_log after, ~0 before
    cap = with_cap["capacity"]
    assert abs(np.mean(cap[550:]) - (-0.15)) < 0.04, np.mean(cap[550:])
    assert abs(np.mean(cap[:450])) < 0.03, np.mean(cap[:450])
    # degradation rate not contaminated by the step
    assert abs(with_cap["degradation_rate_pct_per_year"] - (-1.0)) < 0.6
    # soiling stays near its true level (the step did NOT leak there)
    assert (
        abs(np.mean(with_cap["soiling"][550:]) - np.mean(soil_true[550:]))
        < 0.03
    )

    # WITHOUT the capacity term the step must leak into degradation —
    # i.e. the new component is load-bearing, not decorative
    without = fit_loss_components(energy)
    assert abs(without["degradation_rate_pct_per_year"] - (-1.0)) > 2.0


def test_capacity_step_midpoint_worst_case():
    """A step exactly at the series midpoint AND year boundary is
    maximally collinear with the trend on 2 years of data — precision
    degrades, but the capacity component still absorbs most of the step
    and degradation stays far better than without labels."""
    from solar_data_tools_spark.algorithms.loss_factors import (
        fit_loss_components,
    )

    log_e, labels, *_ = _planted_series(step_day=365)
    energy = np.exp(log_e)
    with_cap = fit_loss_components(energy, capacity_labels=labels)
    without = fit_loss_components(energy)
    assert np.mean(with_cap["capacity"][415:]) < -0.08
    err_with = abs(with_cap["degradation_rate_pct_per_year"] - (-1.0))
    err_without = abs(without["degradation_rate_pct_per_year"] - (-1.0))
    assert err_with < 0.4 * err_without, (err_with, err_without)


def test_capacity_four_year_recovery_is_tight():
    """With 4 years of data the step/trend collinearity vanishes: both
    the rate and the step recover to reference-grade accuracy."""
    from solar_data_tools_spark.algorithms.loss_factors import (
        fit_loss_components,
    )

    log_e, labels, *_ = _planted_series(n=1460, step_day=730)
    comps = fit_loss_components(np.exp(log_e), capacity_labels=labels)
    assert abs(comps["degradation_rate_pct_per_year"] - (-1.0)) < 0.25
    assert abs(np.mean(comps["capacity"][800:]) - (-0.15)) < 0.02


def test_monotone_degradation_recovery():
    """Nonlinear (monotone) degradation: fast early decay that levels
    off — the linear model averages it; the monotone option tracks it."""
    from solar_data_tools_spark.algorithms.loss_factors import (
        fit_loss_components,
    )

    rng = np.random.default_rng(7)
    n = 730
    t = np.arange(n)
    deg_true = -0.06 * (1.0 - np.exp(-t / 200.0))  # saturating decay
    log_e = (
        0.5
        + 0.05 * np.sin(2 * np.pi * t / 365.2425)
        + deg_true
        + 0.01 * rng.standard_normal(n)
    )
    comps = fit_loss_components(np.exp(log_e), deg_type="monotone")
    d = comps["degradation"]
    # monotone non-increasing, anchored at 0
    assert d[0] == pytest.approx(0.0, abs=1e-9)
    assert np.all(np.diff(d) <= 1e-9)
    # tracks the saturating curve better than the best straight line
    err_mono = np.mean(np.abs(d - deg_true))
    slope = deg_true[-1] / (n - 1)
    err_lin = np.mean(np.abs(slope * t - deg_true))
    assert err_mono < err_lin, (err_mono, err_lin)


def test_deg_type_none_and_fixed():
    from solar_data_tools_spark.algorithms.loss_factors import (
        fit_loss_components,
    )

    log_e, labels, *_ = _planted_series()
    energy = np.exp(log_e)
    none = fit_loss_components(energy, deg_type="none")
    assert none["degradation_rate_pct_per_year"] == pytest.approx(0.0)
    assert np.allclose(none["degradation"], 0.0)

    fixed = fit_loss_components(energy, deg_rate=-0.8)
    assert fixed["degradation_rate_pct_per_year"] == pytest.approx(
        -0.8, abs=0.05
    )


def test_capacity_gap_labels_inherit_regime(spark):
    """ADVICE fix: days inside a data gap inherit the surrounding pwc
    regime — no cap_changed flags on gap entry/exit when the capacity
    level is unchanged."""
    import pandas as pd

    from solar_data_tools_spark.algorithms.daily_flags import (
        detect_capacity_changes,
    )

    rng = np.random.default_rng(11)
    n = 300
    metric = 1.0 + 0.01 * rng.standard_normal(n)
    metric[120:150] = np.nan  # a month-long outage, same capacity after
    pdf = pd.DataFrame(
        {
            "site": 1,
            "date": pd.date_range("2024-01-01", periods=n).date,
            "log_day_max": metric,
        }
    )
    out = (
        detect_capacity_changes(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("date")
        .reset_index(drop=True)
    )
    assert int(out["cap_changed"].sum()) == 0, out[out.cap_changed]
    assert out["capacity_label"].nunique() == 1
