"""Signal decompositions (SURVEY.md §2.8) — Spark-first implementations.

The reference solves these as cvxpy/OSD convex programs per series
(solardatatools/signal_decompositions.py). Here each model is a small,
deterministic numpy solve wrapped in ``applyInPandas`` so a fleet of N
sites runs as N parallel tasks after one shuffle on the site key.

Round-1 scope: D2 ``tl1_l2d2p365`` (quantile loss + smooth periodic
Fourier fit — facade signal_decompositions.py:127-185) via IRLS pinball
regression on a Fourier basis, plus the trend-diagnostic least-squares fit
it shares machinery with. Later rounds add D1/D3-D9 on the same pattern.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solar_data_tools_spark.solvers.basis import fourier_basis


def quantile_regression_irls(
    X: np.ndarray,
    y: np.ndarray,
    tau: float = 0.5,
    max_iter: int = 50,
    tol: float = 1e-8,
    ridge: float = 1e-8,
) -> np.ndarray:
    """Pinball-loss linear regression via iteratively reweighted least
    squares (smoothed check function). Deterministic given inputs.

    Solves  min_beta  sum_i rho_tau(y_i - X_i beta)  with the standard IRLS
    weights w_i = |tau - 1{r_i<0}| / max(|r_i|, eps).
    """
    n, p = X.shape
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    eps = 1e-6
    for _ in range(max_iter):
        r = y - X @ beta
        w = np.where(r >= 0, tau, 1.0 - tau) / np.maximum(np.abs(r), eps)
        XtW = X.T * w
        lhs = XtW @ X + ridge * np.eye(p)
        rhs = XtW @ y
        new_beta = np.linalg.solve(lhs, rhs)
        if np.max(np.abs(new_beta - beta)) < tol:
            beta = new_beta
            break
        beta = new_beta
    return beta


def tl1_l2d2p365_fit(
    y: np.ndarray,
    tau: float = 0.75,
    num_harmonics: int = 3,
    period: float = 365.2425,
    use_ixs: np.ndarray | None = None,
) -> np.ndarray:
    """D2 — smooth periodic quantile fit of a daily signal.

    Parity target: ``tl1_l2d2p365`` (signal_decompositions.py:127-185) —
    pinball(tau) residual + smooth periodic component with period 365.2425.
    The smooth periodic component is parameterized directly on a truncated
    Fourier basis (equivalent regularization path to the reference's
    l2-of-second-diff with periodicity constraint), so the solve is a tiny
    weighted least-squares iteration instead of a cone program.

    Returns the fitted seasonal values (same length as ``y``); NaNs in
    ``y`` are excluded from the fit and filled in the output.
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    t = np.arange(n, dtype=np.float64)
    X = fourier_basis(t, num_harmonics=num_harmonics, period=period)
    mask = np.isfinite(y)
    if use_ixs is not None:
        mask &= np.asarray(use_ixs, dtype=bool)
    if mask.sum() < X.shape[1] + 1:
        return np.full(n, np.nan)
    beta = quantile_regression_irls(X[mask], y[mask], tau=tau)
    return X @ beta


def l2_l1d1_l2d2p365_fit(
    y: np.ndarray,
    w1: float = 5.0,
    tau: float | None = None,
    num_harmonics: int = 3,
    period: float = 365.2425,
    n_iter: int = 5,
) -> tuple[np.ndarray, np.ndarray]:
    """D1 — decompose a daily signal into piecewise-constant + smooth
    seasonal components.

    Parity target: ``l2_l1d1_l2d2p365`` (signal_decompositions.py:45-124):
    l2 residual + l1-of-first-diff (piecewise constant, weight w1) +
    smooth periodic seasonal. Solved by exact alternating minimization —
    each subproblem is solved globally (Fourier least squares / direct TV
    via Condat's algorithm), so the block-coordinate descent is
    deterministic and monotone.

    Returns (pwc, seasonal); NaNs in y are masked out of both fits.
    """
    from solar_data_tools_spark.solvers.tv import tv1d_denoise_nan

    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    t = np.arange(n, dtype=np.float64)
    X = fourier_basis(t, num_harmonics=num_harmonics, period=period,
                      include_intercept=False)
    mask = np.isfinite(y)
    if mask.sum() < X.shape[1] + 2:
        return np.full(n, np.nan), np.full(n, np.nan)

    seasonal = np.zeros(n)
    pwc = np.zeros(n)
    for _ in range(n_iter):
        resid = y - seasonal
        pwc = tv1d_denoise_nan(resid, w1)
        resid2 = y - pwc
        beta = np.linalg.lstsq(X[mask], resid2[mask], rcond=None)[0]
        seasonal = X @ beta
    return pwc, seasonal


def l2_l1d2_constrained_fit(
    y: np.ndarray,
    w: float = 1.0,
    n_irls: int = 20,
    eps: float = 1e-6,
) -> np.ndarray:
    """D4 — piecewise-linear fit of a CDF: l2 residual + l1 of the second
    difference, constrained to f(0)=y[0], f(end)=y[-1].

    Parity target: ``l2_l1d2_constrained`` (signal_decompositions.py:229-
    256), used by clipping detection on the 5000-point resampled CDF. The
    l1-of-D2 term is handled by IRLS (reweighted quadratic smoothing);
    endpoint constraints by elimination. Deterministic.

    Scale note: dense solve is O(n^3) — fine at the CDF grid sizes the
    reference uses after resampling (<= a few thousand); the resample step
    (A11) is what keeps n bounded, exactly as in the reference.
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n < 4:
        return y.copy()
    # second-difference operator
    D = np.zeros((n - 2, n))
    for i in range(n - 2):
        D[i, i], D[i, i + 1], D[i, i + 2] = 1.0, -2.0, 1.0
    wts = np.ones(n - 2)
    x = y.copy()
    I = np.eye(n)
    for _ in range(n_irls):
        A = I + w * (D.T * wts) @ D
        # endpoint equality via large quadratic penalty (exact in the limit;
        # 1e8 puts the residual far below the comparison tolerance)
        A[0, 0] += 1e8
        A[-1, -1] += 1e8
        b = y.copy()
        b[0] += 1e8 * y[0]
        b[-1] += 1e8 * y[-1]
        x_new = np.linalg.solve(A, b)
        d2 = D @ x_new
        wts = 1.0 / np.maximum(np.abs(d2), eps)
        if np.max(np.abs(x_new - x)) < 1e-9:
            x = x_new
            break
        x = x_new
    return x


def fit_seasonal_quantile(
    daily: DataFrame,
    value_col: str = "energy",
    tau: float = 0.75,
    num_harmonics: int = 3,
    period: float = 365.2425,
    site_col: str = "site",
    date_col: str = "date",
) -> DataFrame:
    """Run D2 per site over the daily table with ``applyInPandas``.

    One shuffle on ``site``; each task fits one site's series (365*years
    points — trivially fits executor memory, SURVEY §7.4 risk 4). Rows are
    sorted *inside* the UDF (never trust shuffle order, risk 5).

    Output: (site, date, <value_col>, seasonal_fit).
    """
    from solar_data_tools_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(daily.sparkSession)
    schema = (
        f"{site_col} long, {date_col} date, {value_col} double, "
        "seasonal_fit double"
    )
    site_dtype = dict(daily.dtypes)[site_col]
    if site_dtype == "string":
        schema = schema.replace(f"{site_col} long", f"{site_col} string")

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(date_col).reset_index(drop=True)
        fit = tl1_l2d2p365_fit(
            pdf[value_col].to_numpy(dtype=np.float64),
            tau=tau,
            num_harmonics=num_harmonics,
            period=period,
        )
        return pd.DataFrame(
            {
                site_col: pdf[site_col],
                date_col: pdf[date_col],
                value_col: pdf[value_col],
                "seasonal_fit": fit,
            }
        )

    from solar_data_tools_spark.parallel import partition_for_grouped_map

    prepared = partition_for_grouped_map(
        daily.select(site_col, date_col, value_col), [site_col]
    )
    return prepared.groupBy(site_col).applyInPandas(_fit, schema=schema)


def detrend_daily_signal(
    daily: DataFrame,
    value_col: str = "energy",
    site_col: str = "site",
    date_col: str = "date",
    tau: float = 0.9,
) -> DataFrame:
    """Seasonal-correct a daily signal: value / seasonal_fit (the reference
    normalizes daily signals by their seasonal quantile fit before change
    detection, e.g. data_quality.py:42, clear_day_detection.py:75-86)."""
    fitted = fit_seasonal_quantile(daily, value_col, tau, site_col=site_col)
    return fitted.withColumn(
        "seasonal_ratio",
        F.when(
            F.col("seasonal_fit") > 0, F.col(value_col) / F.col("seasonal_fit")
        ),
    )
