"""M7 — PCA-basis shade decomposition: the rank-6 clear-sky class must
bridge a planted shade notch (attributing the deficit to shade) instead
of bending the clear-sky model into it."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_basis_loads_and_is_orthonormal():
    from solar_data_tools_spark.algorithms.shade import load_shade_pca_basis

    b = load_shade_pca_basis()
    assert b["mu"].shape == (256,)
    assert b["q_mat"].shape == (256, 6)
    assert b["lambd"].shape == (6,)
    # eigenvector columns are orthonormal, spectrum positive descending
    np.testing.assert_allclose(
        b["q_mat"].T @ b["q_mat"], np.eye(6), atol=1e-8
    )
    assert (np.diff(b["lambd"]) <= 0).all()
    assert (b["lambd"] > 0).all()


def _notched_profile(n, notch_lo, notch_hi, depth, rng):
    """A clear-day-like normalized profile with a shade notch."""
    x = np.linspace(0, 1, n)
    prof = np.sin(np.pi * x) ** 1.2
    prof = prof / prof.max()
    notch = np.zeros(n)
    notch[notch_lo:notch_hi] = depth
    return np.clip(prof - notch + rng.normal(0, 0.005, n), 0, None)


def test_pca_fit_bridges_notch():
    from solar_data_tools_spark.algorithms.shade import (
        _fit_pca_clearsky,
        _resample_basis,
        load_shade_pca_basis,
    )

    rng = np.random.default_rng(5)
    n = 64
    basis = _resample_basis(load_shade_pca_basis(), n)
    obs = _notched_profile(n, 40, 50, 0.35, rng)
    clear, shade = _fit_pca_clearsky(obs, basis)
    # the clear-sky model stays near the unnotched profile over the notch
    x = np.linspace(0, 1, n)
    truth = np.sin(np.pi * x) ** 1.2
    truth /= truth.max()
    assert np.mean(np.abs(clear[40:50] - truth[40:50])) < 0.12
    # the deficit concentrates inside the notch
    inside = shade[40:50].mean()
    outside = np.r_[shade[5:35], shade[55:60]].mean()
    assert inside > 0.2
    assert inside > 5 * outside


def test_decompose_shade_flags_notch(spark):
    from solar_data_tools_spark.algorithms.shade import decompose_shade

    rng = np.random.default_rng(9)
    n = 64
    rows = []
    for db in (-20.0, 0.0, 20.0):
        obs = _notched_profile(n, 40, 50, 0.35, rng)
        rows.append(
            pd.DataFrame(
                {
                    "site": 1,
                    "delta_bin": db,
                    "dil_slot": np.arange(n),
                    "observed": obs,
                }
            )
        )
    grid = spark.createDataFrame(pd.concat(rows, ignore_index=True))
    out = decompose_shade(grid).toPandas()
    assert len(out) == 3 * n
    notch = out[(out.dil_slot >= 41) & (out.dil_slot <= 48)]
    clear_zone = out[(out.dil_slot >= 10) & (out.dil_slot <= 30)]
    assert notch.is_shaded.mean() > 0.8, notch.shade_frac.describe()
    assert clear_zone.is_shaded.mean() < 0.1
