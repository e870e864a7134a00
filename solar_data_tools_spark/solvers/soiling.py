"""D5 — sawtooth-dictionary soiling separation.

Parity target: the reference's soiling term in the loss-factor model
(loss_factor_analysis.py:497-508 with the dictionary built at :759-780):
the soiling component is expanded on a dictionary of descending sawtooth
"teeth" — each atom ramps from 0 down to -1 over its support and resets
at a cleaning event — plus a constant atom, with an l1 penalty on the
atom coefficients (stiffness) and on the component itself (sparsity),
and the component constrained nonpositive.

Restricting coefficients to alpha >= 0 makes the pointwise
nonpositivity automatic (every atom is <= 0) and turns the fit into a
nonnegative LASSO solved by monotone FISTA — deterministic numpy, no
cone solver. The reference allows sign-free coefficients with a
pointwise constraint; on sawtooth soiling signals the active atoms are
nonnegative combinations, so the restriction does not change the
recovered structure (validated on planted sawtooths in
tests/test_soiling_dictionary.py).
"""

from __future__ import annotations

import numpy as np


def _falling_sawtooth(k: int, phase: float, T: int) -> np.ndarray:
    """scipy.signal.sawtooth(x, width=0)/2 - 0.5 over k periods: value
    -frac((x)/(2pi)) in (-1, 0]."""
    x = np.linspace(-phase, k * 2.0 * np.pi - phase, T)
    return -((x / (2.0 * np.pi)) % 1.0)


def make_st(k: int, phase: float, T: int) -> np.ndarray:
    """One (k, phase) sawtooth split into per-tooth atoms
    (loss_factor_analysis.py:770-780): columns are the waveform restricted
    to the span between consecutive resets (local maxima), zero
    elsewhere."""
    wf = _falling_sawtooth(k, phase, T)
    # interior local maxima = the sample right after each reset
    peaks = (
        np.where((wf[1:-1] > wf[:-2]) & (wf[1:-1] >= wf[2:]))[0] + 1
    )
    bounds = np.r_[0, peaks, T]
    out = np.zeros((T, len(bounds) - 1))
    for s in range(len(bounds) - 1):
        out[bounds[s] : bounds[s + 1], s] = wf[bounds[s] : bounds[s + 1]]
    return out


def make_sawtooth_dictionary(T: int) -> np.ndarray:
    """Dense T x K dictionary: constant -1 atom + per-tooth atoms for
    k = 2..31 teeth at phases {0, pi} (loss_factor_analysis.py:759-767)."""
    cols = [-np.ones((T, 1))]
    for k in range(2, 32):
        for ph in (0.0, np.pi):
            cols.append(make_st(k, ph, T))
    return np.concatenate(cols, axis=1)


def fit_soiling_sawtooth(
    resid: np.ndarray,
    w_stiff: float = 5e-2,
    w_sparse: float = 5e-3,
    max_iters: int = 1000,
    tol: float = 1e-9,
) -> np.ndarray:
    """Fit the soiling component to a (log-space) residual:

        min ||r - D a||^2 + w_stiff ||a||_1 + w_sparse ||D a||_1
        s.t. a >= 0            (=> soiling = D a <= 0 pointwise)

    With a >= 0 and D <= 0 both l1 terms are linear, so this is a
    nonnegative-constrained least squares with a linear offset — solved
    by monotone FISTA with projection onto the nonnegative orthant.
    NaNs in ``resid`` are excluded from the data term.
    """
    resid = np.asarray(resid, dtype=np.float64)
    T = len(resid)
    use = np.isfinite(resid)
    D = make_sawtooth_dictionary(T)
    Du = D[use]
    ru = resid[use]
    K = D.shape[1]
    # linear term: w_stiff * sum(a) + w_sparse * sum(-D a)
    c = w_stiff - w_sparse * D.sum(axis=0)
    # Lipschitz constant of the quadratic via power iteration
    v = np.ones(K) / np.sqrt(K)
    for _ in range(50):
        v = Du.T @ (Du @ v)
        nv = np.linalg.norm(v)
        if nv == 0:
            break
        v /= nv
    L = 2.0 * max(nv, 1e-12)
    step = 1.0 / L
    a = np.zeros(K)
    z = a.copy()
    t_mom = 1.0
    best = np.inf
    for _ in range(max_iters):
        grad = 2.0 * (Du.T @ (Du @ z - ru)) + c
        a_new = np.maximum(z - step * grad, 0.0)
        t_new = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * t_mom**2))
        z = a_new + ((t_mom - 1.0) / t_new) * (a_new - a)
        move = float(np.max(np.abs(a_new - a), initial=0.0))
        a, t_mom = a_new, t_new
        scale = float(np.abs(ru).max()) if len(ru) else 1.0
        if move < tol * max(1.0, scale):
            break
    return D @ a


def fit_soiling_sawtooth_with_trend(
    resid: np.ndarray,
    years: np.ndarray,
    w_stiff: float = 5e-2,
    w_sparse: float = 1e-4,
    num_harmonics: int = 2,
    w_seasonal: float = 1e-3,
    period: float = 365.2425,
    max_iters: int = 5000,
    tol: float = 1e-9,
) -> tuple[float, float, np.ndarray, np.ndarray]:
    """Joint intercept + linear degradation + smooth seasonal + sawtooth
    soiling fit (ONE convex problem, mirroring the reference's
    all-components-at-once design, loss_factor_analysis.py:460-556):

        min ||r - b - beta*years - B th - D a||^2 + th' Q th
            + w_stiff ||a||_1 + w_sparse ||D a||_1    s.t.  a >= 0.

    Joint, not block-coordinate: the soiling component resets to ~0 at
    each cleaning event, so the degradation line is identified by the
    envelope maxima and the seasonal term cannot absorb the sawtooth's
    annual harmonic — alternating fits lose both identifications.

    Returns (intercept, beta_per_year, seasonal, soiling).
    """
    from solar_data_tools_spark.solvers.exact import (
        harmonic_penalty,
        trig_basis,
    )

    resid = np.asarray(resid, dtype=np.float64)
    T = len(resid)
    use = np.isfinite(resid)
    D = make_sawtooth_dictionary(T)
    B = trig_basis(T, num_harmonics, period, include_const=False)
    qs = harmonic_penalty(
        num_harmonics, w_seasonal, period, include_const=False
    )
    p = B.shape[1]
    S = np.hstack([np.ones((T, 1)), years.reshape(-1, 1), B])
    Su = S[use]
    Du = D[use]
    ru = resid[use]
    # Partial minimization over the smooth block (intercept, trend,
    # seasonal): for fixed a the smooth coefficients solve a tiny ridge
    # system, so the a-subproblem sees the PROJECTED quadratic
    # f(a) = (r - D a)' M (r - D a),  M = I - Su A^{-1} Su'.
    # FISTA then runs on a alone — the raw joint system mixes column
    # scales of 1 and ~sqrt(T) and converges hopelessly slowly.
    q_smooth = np.concatenate([[0.0, 0.0], qs])
    A = Su.T @ Su + np.diag(q_smooth) + 1e-12 * np.eye(2 + p)
    Ainv = np.linalg.inv(A)
    proj = Su @ (Ainv @ Su.T)  # n_use^2; site-years => a few MB

    def apply_M(v):
        return v - proj @ v

    c = w_stiff - w_sparse * D.sum(axis=0)
    MDu = Du - proj @ Du
    G = Du.T @ MDu  # Gram of the projected dictionary
    g = MDu.T @ ru
    # Exact cyclic coordinate descent on the nonnegative lasso
    #   min a'Ga - 2 g'a + c'a,  a >= 0.
    # The tooth atoms are highly coherent (nested supports across k), so
    # gradient methods crawl; per-coordinate exact minimization with an
    # incrementally maintained u = G a converges in tens of sweeps.
    K = D.shape[1]
    a = np.zeros(K)
    u = np.zeros(K)
    diag = np.maximum(np.diag(G), 1e-12)
    scale = float(np.abs(ru).max()) if len(ru) else 1.0
    n_sweeps = max(30, max_iters // 50)
    for _ in range(n_sweeps):
        max_move = 0.0
        for j in range(K):
            new = max(0.0, a[j] + (g[j] - u[j] - 0.5 * c[j]) / diag[j])
            delta = new - a[j]
            if delta != 0.0:
                u += G[:, j] * delta
                a[j] = new
                max_move = max(max_move, abs(delta))
        if max_move < tol * max(1.0, scale):
            break
    w_smooth = Ainv @ (Su.T @ (ru - Du @ a))
    seasonal = B @ w_smooth[2:]
    soiling = D @ a
    return float(w_smooth[0]), float(w_smooth[1]), seasonal, soiling
