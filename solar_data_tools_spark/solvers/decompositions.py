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
    Delegates to the exact ADMM solver (``solvers.exact``), which is
    validated against the reference's own fixture files at the reference
    tolerances (tests/test_solver_fixtures.py).

    Returns the fitted seasonal values (same length as ``y``); NaNs in
    ``y`` are excluded from the fit and filled in the output.
    """
    from solar_data_tools_spark.solvers.exact import solve_tl1_l2d2p365

    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    mask = np.isfinite(y)
    if use_ixs is not None:
        mask &= np.asarray(use_ixs, dtype=bool)
    if mask.sum() < 2 * num_harmonics + 2:
        return np.full(n, np.nan)
    s_seas, _obj = solve_tl1_l2d2p365(
        y,
        tau=tau,
        use_ixs=use_ixs,
        num_harmonics=num_harmonics,
        period=period,
    )
    return s_seas


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
    smooth periodic seasonal. Delegates to the exact ADMM + support-polish
    solver (``solvers.exact``), fixture-validated against the reference's
    published outputs (tests/test_solver_fixtures.py).

    Returns (pwc, seasonal); NaNs in y are masked out of both fits.
    """
    from solar_data_tools_spark.solvers.exact import solve_l2_l1d1_l2d2p365

    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    mask = np.isfinite(y)
    if mask.sum() < 2 * num_harmonics + 3:
        return np.full(n, np.nan), np.full(n, np.nan)
    s_hat, s_seas, _obj = solve_l2_l1d1_l2d2p365(
        y, w1=w1, num_harmonics=num_harmonics, period=period
    )
    return s_hat, s_seas


def l2_l1d2_constrained_fit(
    y: np.ndarray,
    w: float = 1.0,
    n_irls: int = 20,
    eps: float = 1e-6,
) -> np.ndarray:
    """D4 — piecewise-linear fit of a CDF: l2 residual + l1 of the second
    difference, constrained to f(0)=y[0], f(end)=y[-1].

    Parity target: ``l2_l1d2_constrained`` (signal_decompositions.py:229-
    256), used by clipping detection on the resampled CDF. Delegates to
    the exact ADMM + support-polish solver (``solvers.exact``), which pins
    x[0]=0, x[-1]=1; general endpoints are handled by the affine map
    x = a + (b-a) x_hat, under which the l1 weight rescales to w/(b-a).

    Scale note: dense solve is O(n^3) — fine at the CDF grid sizes the
    reference uses after resampling (<= a few thousand); the resample step
    (A11) is what keeps n bounded, exactly as in the reference.
    """
    from solar_data_tools_spark.solvers.exact import solve_l2_l1d2_constrained

    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n < 4:
        return y.copy()
    a, b = float(y[0]), float(y[-1])
    if not np.isfinite(a) or not np.isfinite(b) or abs(b - a) < 1e-12:
        return y.copy()
    y_norm = (y - a) / (b - a)
    x_norm, _obj = solve_l2_l1d2_constrained(y_norm, w0=1.0, w1=w / abs(b - a))
    return a + (b - a) * x_norm


def fit_seasonal_quantile(
    daily: DataFrame,
    value_col: str = "energy",
    tau: float = 0.75,
    num_harmonics: int = 3,
    period: float = 365.2425,
    site_col: str = "site",
    date_col: str = "date",
) -> DataFrame:
    """Run D2 over the daily table, batched per partition.

    One shuffle on ``site``; each task stacks ALL of its sites onto one
    shared day axis (phase shifts rotate within each harmonic pair and
    the penalty is pair-isotropic, so per-site fits on a global axis are
    identical to local-axis fits — see ``solve_tl1_l2d2p365_batch``) and
    runs ONE batched interior-point solve for the whole column matrix.
    This amortizes the per-fit setup cost across the partition's fleet
    slice — the dominant cost once the solve itself is ~30 Newton steps.

    Memory per task is (span_days x sites_in_partition) doubles — a
    45-year span at 1 000 sites/partition is ~130 MB, far under executor
    memory; sites are hash-spread so a fleet of millions of sites scales
    by partition count, not per-task size (SURVEY §7.4 risk 4). Rows are
    sorted *inside* the UDF (never trust shuffle order, risk 5).

    Output: (site, date, <value_col>, seasonal_fit).
    """
    from solar_data_tools_spark.shipping import ensure_package_on_executors
    from solar_data_tools_spark.solvers.exact import solve_tl1_l2d2p365_batch

    spark = daily.sparkSession
    ensure_package_on_executors(spark)
    schema = (
        f"{site_col} long, {date_col} date, {value_col} double, "
        "seasonal_fit double"
    )
    site_dtype = dict(daily.dtypes)[site_col]
    if site_dtype == "string":
        schema = schema.replace(f"{site_col} long", f"{site_col} string")
    min_rows = 2 * num_harmonics + 2

    def _fit_partition(batches):
        pdfs = [p for p in batches]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        dates = pd.to_datetime(pdf[date_col])
        d0 = dates.min()
        offs = (dates - d0).dt.days.to_numpy()
        T = int(offs.max()) + 1
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        sites, inv = np.unique(pdf[site_col].to_numpy(), return_inverse=True)
        if T > 40000:
            # pathological era spread (sites decades apart in one
            # partition): fall back to per-site fits rather than build a
            # huge mostly-masked matrix
            fit_out = np.full(len(pdf), np.nan)
            for j in range(len(sites)):
                sel = inv == j
                o = offs[sel]
                o = o - o.min()
                y = np.full(int(o.max()) + 1, np.nan)
                y[o] = vals[sel]
                f = tl1_l2d2p365_fit(
                    y, tau=tau, num_harmonics=num_harmonics, period=period
                )
                fit_out[sel] = f[o]
        else:
            Y = np.full((T, len(sites)), np.nan)
            Y[offs, inv] = vals
            fits, _obj = solve_tl1_l2d2p365_batch(
                Y, tau, num_harmonics=num_harmonics, period=period
            )
            # min-data guard per column, matching tl1_l2d2p365_fit
            low = np.isfinite(Y).sum(axis=0) < min_rows
            if low.any():
                fits[:, low] = np.nan
            fit_out = fits[offs, inv]
        yield pd.DataFrame(
            {
                site_col: pdf[site_col],
                date_col: pdf[date_col],
                value_col: pdf[value_col],
                "seasonal_fit": fit_out,
            }
        )

    from solar_data_tools_spark.parallel import partition_for_grouped_map

    # one task wave per core: the per-partition batched solve costs
    # milliseconds, so task-count overhead dominates straggler variance
    prepared = partition_for_grouped_map(
        daily.select(site_col, date_col, value_col), [site_col],
        tasks_per_core=1,
    )
    return prepared.mapInPandas(_fit_partition, schema=schema)


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
