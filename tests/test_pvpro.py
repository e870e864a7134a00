"""M10 — PVPRO post-processing: 5-component decomposition of module
parameter series (planted periodic + monotone degradation + sparse
spikes must separate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_pava_projection():
    from solar_data_tools_spark.algorithms.pvpro import pava_decreasing

    y = np.array([3.0, 1.0, 2.0, 0.5, 0.6, 0.1])
    z = pava_decreasing(y)
    assert (np.diff(z) <= 1e-12).all()
    # projection: closer to y than any other monotone candidate we try
    assert np.sum((z - y) ** 2) <= np.sum((np.sort(y)[::-1] - y) ** 2) + 1e-9


def _planted(T=365, p=73, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(T)
    periodic = 0.05 * np.sin(2 * np.pi * t / p)
    deg = -0.15 * (t / T) ** 0.7  # monotone decreasing, nonlinear
    spikes = np.zeros(T)
    spike_ix = rng.choice(T, 5, replace=False)
    spikes[spike_ix] = rng.choice([-0.3, 0.3], 5)
    y = 1.0 + periodic + deg + spikes + rng.normal(0, 0.01, T)
    return y, periodic, deg, spikes, spike_ix


def test_component_separation():
    from solar_data_tools_spark.algorithms.pvpro import solve_pvpro_components

    y, periodic, deg, spikes, spike_ix = _planted()
    out = solve_pvpro_components(y, period=73, model="smooth_monotonic")
    # degradation: monotone decreasing, tracks truth
    assert (np.diff(out["x5"]) <= 1e-9).all()
    assert np.corrcoef(out["x5"], deg)[0, 1] > 0.97
    assert np.mean(np.abs(out["x5"] - deg)) < 0.03
    # periodic: zero-mean and correlated with the planted cycle
    assert abs(out["x4"].mean()) < 1e-6
    assert np.corrcoef(out["x4"], periodic)[0, 1] > 0.9
    # sparse noise: catches the planted spikes (soft-threshold shrinks
    # magnitudes), sparse elsewhere
    assert (np.abs(out["x2"][spike_ix]) > 0.02).all()
    assert (np.abs(out["x2"]) > 1e-6).sum() < 30
    # reconstruction: composed + sparse close to data
    resid = y - out["composed"] - out["x2"]
    assert np.sqrt((resid**2).mean()) < 0.03


def test_linear_model_and_increasing_series():
    from solar_data_tools_spark.algorithms.pvpro import solve_pvpro_components

    rng = np.random.default_rng(4)
    T = 292
    t = np.arange(T)
    y = 0.5 + 0.001 * t + rng.normal(0, 0.005, T)  # increasing (series R)
    out = solve_pvpro_components(
        y, period=73, model="monotonic", decreasing=False
    )
    assert (np.diff(out["x5"]) >= -1e-9).all()
    assert out["x5"][-1] > 0.2


def test_fleet_wrapper(spark):
    from solar_data_tools_spark.algorithms.pvpro import pvpro_postprocess

    y, *_ = _planted()
    rows = []
    for param in ("photocurrent_ref", "resistance_series_ref"):
        vals = y if "series" not in param else y[::-1]
        rows.append(
            pd.DataFrame(
                {
                    "site": 1,
                    "param": param,
                    "seq": np.arange(len(y)),
                    "value": vals,
                }
            )
        )
    df = spark.createDataFrame(pd.concat(rows, ignore_index=True))
    out = pvpro_postprocess(df, period=73).toPandas()
    assert len(out) == 2 * len(y)
    for param, g in out.groupby("param"):
        g = g.sort_values("seq")
        d = np.diff(g.degradation.to_numpy())
        if "series" in param:
            assert (d >= -1e-9).all()  # series resistance grows
        else:
            assert (d <= 1e-9).all()
        assert abs(g.periodic.mean()) < 1e-3
