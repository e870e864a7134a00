"""D7 quantile-surface correctness: recovered levels match the known
noise distribution, surfaces never cross, and the clear-sky DP pipeline
separates planted cloudy stretches."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def _make_dilated(n_days=90, nvals=24, cloudy=(), seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    slots = np.arange(nvals)
    bell = np.sin((slots + 0.5) / nvals * np.pi)
    for d in range(n_days):
        date = pd.Timestamp("2024-01-01") + pd.Timedelta(days=d)
        scale = 0.35 if d in cloudy else 1.0
        vals = 100.0 * scale * bell * (1 + rng.normal(0, 0.05, nvals))
        for s, v in zip(slots, vals):
            rows.append((1, date.date(), int(s), float(max(v, 0.0))))
    return pd.DataFrame(rows, columns=["site", "date", "dil_slot", "dil_value"])


def test_quantile_levels_bracket_data_and_do_not_cross(spark):
    from solar_data_tools_spark.solvers.quantile_surface import estimate_quantiles

    pdf = _make_dilated()
    dil = spark.createDataFrame(pdf)
    out = estimate_quantiles(dil, nvals=24, levels=(0.1, 0.5, 0.9)).toPandas()
    wide = out.pivot_table(
        index=["date", "dil_slot"], columns="level", values="qvalue"
    )
    # non-crossing everywhere
    assert (wide[0.5] >= wide[0.1] - 1e-9).all()
    assert (wide[0.9] >= wide[0.5] - 1e-9).all()
    # coverage: empirical fraction below each fitted level ~ the level
    merged = out.merge(pdf, on=["site", "date", "dil_slot"])
    mid = merged[merged.dil_slot.between(6, 17)]  # away from near-zero edges
    for tau in (0.1, 0.5, 0.9):
        lv = mid[mid.level == tau]
        frac = (lv.dil_value <= lv.qvalue).mean()
        assert abs(frac - tau) < 0.12, (tau, frac)


def test_clear_sky_pipeline_flags_cloudy_stretch(spark):
    from solar_data_tools_spark.solvers.quantile_surface import (
        detect_clear_sky,
        estimate_quantiles,
    )

    cloudy = set(range(40, 50))
    pdf = _make_dilated(cloudy=cloudy)
    dil = spark.createDataFrame(pdf)
    q = estimate_quantiles(dil, nvals=24, levels=(0.9,))
    labels = detect_clear_sky(dil, q).toPandas()
    labels["day_ix"] = (
        pd.to_datetime(labels.date) - pd.Timestamp("2024-01-01")
    ).dt.days
    # midday slots: cloudy days mostly not clear, normal days mostly clear
    mid = labels[labels.dil_slot.between(8, 15)]
    cl = mid[mid.day_ix.isin(cloudy)]
    ok = mid[~mid.day_ix.isin(cloudy)]
    assert cl.is_clear.mean() < 0.2, cl.is_clear.mean()
    assert ok.is_clear.mean() > 0.7, ok.is_clear.mean()
