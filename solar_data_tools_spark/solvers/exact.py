"""Exact convex signal-decomposition solvers (SURVEY.md §2.8, D1-D4).

Parity targets (reference formulations, re-derived from public problem
statements — NOT a code port):

- ``l2_l1d1_l2d2p365``  (reference signal_decompositions.py:45-124 and
  _osd_signal_decompositions.py:48-135): squared residual + w1 * l1 of the
  first difference of a piecewise-constant component + a smooth seasonal
  component restricted to a 3-harmonic Fourier basis (period 365.2425,
  plus intercept) with zero average and a tiny quadratic harmonic penalty.
- ``tl1_l2d2p365``      (reference _osd_signal_decompositions.py:138-186):
  pinball(tau) residual + the same smooth Fourier seasonal component.
- ``l1_pwc_smoothper_trend`` (reference _cvx_signal_decompositions.py:193-
  289): mean-abs residual + w2 * mean of (reweighted) abs first diffs of a
  piecewise-constant term + quadratic harmonic penalty on a 6-harmonic
  seasonal + bounded linear trend, with one pass of iterative reweighting.
- ``l2_l1d2_constrained`` (reference _osd_signal_decompositions.py:255-288):
  squared residual + w1 * l1 of second differences, first value pinned to
  0 and last to 1 (piecewise-linear CDF fit for clipping detection).

All four are solved with over-relaxed ADMM followed by a support-pattern
"polish" solve (an equality-constrained QP on the detected sparsity
pattern), which recovers the interior-point optimum to high accuracy —
validated against the reference's own fixture files in
``tests/test_solver_fixtures.py`` at the reference's tolerances
(MAE < 1e-3, objective to 1 decimal; see reference
tests/solardatatools/test_signal_decompositions.py:57-61).

The harmonic penalty constant is the reference's published regularization:
weight^2 * (2*pi*k)^2 / (2*period) per (sin, cos) pair — the square of
``weight * 2*pi*k / sqrt(period)`` on a sqrt(2)-normalized trig basis (see
_cvx_signal_decompositions.py:269-276), intercept unpenalized.

Scale note: these run per site inside ``applyInPandas`` on daily-level
series (365 * years points, <= a few thousand). Per-solve cost is a few
hundred ms of dense numpy; the fleet dimension is Spark's.
"""

from __future__ import annotations

import numpy as np

PERIOD_DAYS = 365.2425


# ---------------------------------------------------------------------------
# bases and penalties
# ---------------------------------------------------------------------------

def trig_basis(T: int, num_harmonics: int, period: float = PERIOD_DAYS,
               include_const: bool = True) -> np.ndarray:
    """[sin(2pi k t/P), cos(2pi k t/P)]_{k=1..K} (+ trailing ones column)."""
    t = np.arange(T, dtype=np.float64)
    cols = []
    for k in range(1, num_harmonics + 1):
        w = 2.0 * np.pi * k * t / period
        cols.append(np.sin(w))
        cols.append(np.cos(w))
    if include_const:
        cols.append(np.ones(T))
    return np.column_stack(cols)


def harmonic_penalty(num_harmonics: int, weight: float,
                     period: float = PERIOD_DAYS,
                     include_const: bool = True,
                     normalized_basis: bool = True) -> np.ndarray:
    """Diagonal quadratic penalty on trig_basis coefficients.

    The reference regularization weight per harmonic is
    ``weight * 2*pi*k / sqrt(period)`` (squared in the objective;
    _cvx_signal_decompositions.py:271-276), applied in the coefficient
    space of the published basis. Expressed on the plain trig basis used
    here this is ``weight^2 (2 pi k)^2 / period`` per sin/cos coefficient
    — halved when the consuming path normalizes basis columns by sqrt(2)
    (the gfosd Fourier component does; the direct CVXPY path does not).
    Intercept unpenalized (reference drops the bias row).

    Both constants are fixture-validated: ``normalized_basis=True``
    against the l2_l1d1/tl1 fixtures, ``False`` against the
    l1_pwc_smoothper_trend fixture (tests/test_solver_fixtures.py).
    """
    denom = 2.0 * period if normalized_basis else period
    vals = []
    for k in range(1, num_harmonics + 1):
        q = weight ** 2 * (2.0 * np.pi * k) ** 2 / denom
        vals.extend([q, q])
    if include_const:
        vals.append(0.0)
    return np.array(vals)


def _diff1(n: int) -> np.ndarray:
    D = np.zeros((n - 1, n))
    idx = np.arange(n - 1)
    D[idx, idx] = -1.0
    D[idx, idx + 1] = 1.0
    return D


def _diff2(n: int) -> np.ndarray:
    D = np.zeros((n - 2, n))
    idx = np.arange(n - 2)
    D[idx, idx] = 1.0
    D[idx, idx + 1] = -2.0
    D[idx, idx + 2] = 1.0
    return D


def _soft(v: np.ndarray, k) -> np.ndarray:
    return np.sign(v) * np.maximum(np.abs(v) - k, 0.0)


def _admm_converged(r_prim: np.ndarray, z_step: np.ndarray, rho: float,
                    tol: float = 1e-8) -> bool:
    """Early-exit test: primal residual and (scaled) dual step both tiny.

    The dual residual is rho * ||A' (z - z_prev)||; dropping the constant
    operator keeps the check allocation-free, and the tolerance is far
    below the fixture tolerances (MAE 1e-3), so stopping here never costs
    parity — it only trims the fixed-iteration overdrive that dominates
    wall time on short (fleet-daily-length) series.
    """
    return (
        float(np.max(np.abs(r_prim), initial=0.0)) < tol
        and rho * float(np.max(np.abs(z_step), initial=0.0)) < tol
    )


# ---------------------------------------------------------------------------
# D1: l2_l1d1_l2d2p365
# ---------------------------------------------------------------------------

def solve_l2_l1d1_l2d2p365(
    y: np.ndarray,
    w1: float = 50.0,
    w2: float = 1e-3,
    use_ixs: np.ndarray | None = None,
    yearly_periodic: bool = False,
    num_harmonics: int = 3,
    period: float = PERIOD_DAYS,
    admm_iters: int = 4000,
    rho: float | None = None,
    transition_locs: np.ndarray | None = None,
):
    """Minimize  sum_use (y - B th - x)^2 + w1 ||D1 x||_1 + th' Q th
    s.t. mean(B th) = 0 over the full index, optionally x 365-periodic.

    ``rho`` defaults to max(1, w1/7.5): the scaled dual must reach w1/rho
    to sustain an active jump, so a fixed rho makes convergence
    arbitrarily slow as w1 grows (observed on the time-shift golden at
    w1=75: 4000 iterations with rho=1 missed the planted jump entirely).

    With ``transition_locs`` the l1 term is replaced by a segment-basis
    constraint (x piecewise constant with breakpoints AT the given
    indices, reference _osd_signal_decompositions.py:106-118) and the
    problem reduces to one equality-constrained least squares — no ADMM.

    Returns (s_hat, s_seas, obj).
    """
    y = np.asarray(y, dtype=np.float64)
    if rho is None:
        rho = max(1.0, w1 / 7.5)
    T = len(y)
    use = np.isfinite(y)
    if use_ixs is not None:
        use &= np.asarray(use_ixs, dtype=bool)
    yc = np.where(use, y, 0.0)

    B = trig_basis(T, num_harmonics, period)
    p = B.shape[1]
    q = harmonic_penalty(num_harmonics, w2, period) + 1e-12

    if transition_locs is not None:
        locs = np.asarray(transition_locs, dtype=np.int64)
        bounds = np.r_[0, locs, T]
        k = len(bounds) - 1
        S = np.zeros((T, k))
        for j in range(k):
            S[bounds[j] : bounds[j + 1], j] = 1.0
        X = np.hstack([B, S])[use]
        nu = p + k
        c = np.concatenate([B.sum(axis=0), np.zeros(k)])
        K = np.zeros((nu + 1, nu + 1))
        A2 = 2.0 * (X.T @ X)
        A2[np.arange(p), np.arange(p)] += 2.0 * q
        K[:nu, :nu] = A2 + 1e-12 * np.eye(nu)
        K[:nu, nu] = c
        K[nu, :nu] = c
        rhs = np.zeros(nu + 1)
        rhs[:nu] = 2.0 * (X.T @ yc[use])
        sol = np.linalg.solve(K, rhs)
        theta, zz = sol[:p], sol[p : p + k]
        s_seas = B @ theta
        s_hat = S @ zz
        e = (y - s_seas - s_hat)[use]
        obj = float(np.sum(e**2) + theta @ (q * theta))
        return s_hat, s_seas, obj

    # x parameterized as S @ xt; periodic ties day t to day t mod 365
    if yearly_periodic and T > 365:
        n = 365
        S = np.zeros((T, n))
        S[np.arange(T), np.arange(T) % 365] = 1.0
    else:
        n = T
        S = np.eye(T)
    D = _diff1(T) @ S  # (T-1) x n
    m = D.shape[0]

    nu = p + n
    # data matrix rows on the use set: [B | S]
    X = np.hstack([B, S])[use]
    c = np.concatenate([B.sum(axis=0), np.zeros(n)])  # mean-zero on B th
    G = np.hstack([np.zeros((m, p)), D])

    A2 = 2.0 * (X.T @ X)
    A2[np.arange(p), np.arange(p)] += 2.0 * q
    K = np.zeros((nu + 1, nu + 1))
    K[:nu, :nu] = A2 + rho * (G.T @ G)
    K[:nu, nu] = c
    K[nu, :nu] = c
    Kinv = np.linalg.inv(K)
    base_rhs = np.zeros(nu + 1)
    base_rhs[:nu] = 2.0 * (X.T @ yc[use])
    u0 = (Kinv @ base_rhs)[:nu]
    Kg = Kinv[:nu, :nu] @ (rho * G.T)

    y_scale = max(1.0, float(np.abs(yc).max()) if T else 1.0)
    z = np.zeros(m)
    s = np.zeros(m)
    alpha = 1.8
    u = u0.copy()
    for it in range(admm_iters):
        u = u0 + Kg @ (z - s)
        Du = G[:, p:] @ u[p:]
        Dh = alpha * Du + (1.0 - alpha) * z
        z_prev = z
        z = _soft(Dh + s, w1 / rho)
        s += Dh - z
        # converged when both ADMM residuals are tiny (checked cheaply each
        # iter — every array here is already in hand); the support polish
        # below recovers the exact optimum from the detected pattern.
        if it % 25 == 24 and _admm_converged(Du - z, z - z_prev, rho,
                                             tol=1e-8 * y_scale):
            break

    # support-pattern polish: fix zero pattern of D x, solve the resulting
    # equality-constrained QP with the active-sign linear term exactly.
    theta, xt, ok = _polish_l1d1(X, yc[use], q, c, D, z, w1, p, n)
    if not ok:
        theta, xt = u[:p], u[p:]
        for it in range(4 * admm_iters):
            u = u0 + Kg @ (z - s)
            Du = G[:, p:] @ u[p:]
            Dh = alpha * Du + (1.0 - alpha) * z
            z_prev = z
            z = _soft(Dh + s, w1 / rho)
            s += Dh - z
            if it % 25 == 24 and _admm_converged(Du - z, z - z_prev, rho,
                                                 tol=1e-11 * y_scale):
                break
        theta2, xt2, ok2 = _polish_l1d1(X, yc[use], q, c, D, z, w1, p, n)
        if ok2:
            theta, xt = theta2, xt2
        else:
            theta, xt = u[:p], u[p:]

    s_seas = B @ theta
    s_hat = S @ xt
    e = (y - s_seas - s_hat)[use]
    obj = float(np.sum(e ** 2) + w1 * np.sum(np.abs(np.diff(s_hat)))
                + theta @ (q * theta))
    return s_hat, s_seas, obj


def _polish_l1d1(X, yu, q, c, D, z, w1, p, n):
    """Solve min ||X u - y||^2 + th'Qth + w1 * sgn' (D x)_A
    s.t. (D x)_Ac = 0, c'u = 0 for the active pattern from z."""
    tol = 1e-6 * max(1.0, np.abs(z).max() if len(z) else 1.0)
    active = np.abs(z) > tol
    sgn = np.sign(z[active])
    Din = D[~active]
    nu = p + n
    neq = Din.shape[0] + 1
    K = np.zeros((nu + neq, nu + neq))
    A2 = 2.0 * (X.T @ X)
    A2[np.arange(p), np.arange(p)] += 2.0 * q
    K[:nu, :nu] = A2
    E = np.zeros((neq, nu))
    E[: Din.shape[0], p:] = Din
    E[-1, :] = c
    K[:nu, nu:] = E.T
    K[nu:, :nu] = E
    rhs = np.zeros(nu + neq)
    lin = w1 * (D[active].T @ sgn)
    rhs[:nu] = np.concatenate([2.0 * (X.T @ yu)[:p], 2.0 * (X.T @ yu)[p:] - lin])
    try:
        sol = np.linalg.solve(K, rhs)
    except np.linalg.LinAlgError:
        return None, None, False
    u = sol[:nu]
    lam = sol[nu:nu + Din.shape[0]]
    Dx = D @ u[p:]
    # KKT check: active signs must agree, inactive duals within [-w1, w1]
    if np.any(np.sign(Dx[active]) * sgn < -1e-9):
        return None, None, False
    if Din.shape[0] and np.abs(lam).max() > w1 * (1.0 + 1e-4):
        return None, None, False
    return u[:p], u[p:], True


# ---------------------------------------------------------------------------
# D2: tl1_l2d2p365
# ---------------------------------------------------------------------------

def solve_tl1_l2d2p365(
    y: np.ndarray,
    tau: float = 0.75,
    w0: float = 1.0,
    w2: float = 1e-3,
    use_ixs: np.ndarray | None = None,
    num_harmonics: int = 3,
    period: float = PERIOD_DAYS,
    admm_iters: int = 30000,
    rho: float = 0.1,
):
    """Minimize  w0 * sum_use pinball_tau(y - B th) + th' Q th.

    Returns (s_seas, obj).

    Delegates to the batched interior-point solver (J=1), which reaches a
    lower objective than the historical ADMM path in ~30 Newton steps
    (fixture-validated); the over-relaxed ADMM below is kept as the
    fallback for the rare ill-conditioned case where the IPM line search
    stalls before the residual tolerances are met.
    """
    y = np.asarray(y, dtype=np.float64)
    use1 = None if use_ixs is None else np.asarray(use_ixs, dtype=bool)[:, None]
    try:
        S1, O1 = solve_tl1_l2d2p365_batch(
            y[:, None],
            tau,
            w0=w0,
            w2=w2,
            use_ixs=use1,
            num_harmonics=num_harmonics,
            period=period,
            admm_iters=admm_iters,
        )
    except np.linalg.LinAlgError:
        S1, O1 = None, None
    if S1 is not None and np.all(np.isfinite(S1)) and np.isfinite(O1[0]):
        return S1[:, 0], float(O1[0])
    T = len(y)
    use = np.isfinite(y)
    if use_ixs is not None:
        use &= np.asarray(use_ixs, dtype=bool)

    B = trig_basis(T, num_harmonics, period)
    q = harmonic_penalty(num_harmonics, w2, period) + 1e-12
    Bu = B[use]
    yu = y[use]

    # SVD-whitened parameterization: Bu th = U w with orthonormal U. When
    # period >> T (short series fit against the yearly basis) the raw trig
    # columns are nearly collinear and plain ADMM crawls; in the whitened
    # coordinates H = 2 Qw + rho I is perfectly conditioned, so the solve
    # converges in a few hundred iterations regardless of series length.
    U, sv, Vt = np.linalg.svd(Bu, full_matrices=False)
    keep = sv > 1e-12 * (sv[0] if len(sv) else 1.0)
    U, sv, Vt = U[:, keep], sv[keep], Vt[keep]
    M = Vt.T / sv  # th = M @ w
    Qw = (M.T * q) @ M
    r_dim = U.shape[1]

    H = 2.0 * Qw + rho * np.eye(r_dim)
    Hinv = np.linalg.inv(H)
    y_scale = max(1.0, float(np.abs(yu).max()) if len(yu) else 1.0)
    z = np.zeros(len(yu))
    s = np.zeros(len(yu))
    alpha = 1.8
    lam_hi = w0 * tau / rho
    lam_lo = w0 * (1.0 - tau) / rho
    w = np.zeros(r_dim)
    w_check = w.copy()
    for it in range(admm_iters):
        w = Hinv @ (rho * (U.T @ (yu - z + s)))
        r = yu - U @ w
        rh = alpha * r + (1.0 - alpha) * z
        v = rh + s
        z_prev = z
        z = np.where(v > lam_hi, v - lam_hi, np.where(v < -lam_lo, v + lam_lo, 0.0))
        s += rh - z
        if it % 25 == 24:
            # two independent stop rules: (a) standard primal/dual
            # residuals; (b) the low-dimensional coefficient vector has
            # stopped moving across a whole check interval — on kinky
            # real-world series the duals can chatter indefinitely at the
            # pinball kinks while the fit itself is long converged.
            if _admm_converged(r - z, z - z_prev, rho, tol=1e-8 * y_scale):
                break
            if float(np.max(np.abs(w - w_check), initial=0.0)) < 1e-10 * y_scale:
                break
            w_check = w.copy()
    th = M @ w
    r = yu - Bu @ th
    obj = float(w0 * np.sum(np.maximum(tau * r, (tau - 1.0) * r)) + th @ (q * th))
    return B @ th, obj


def solve_tl1_l2d2p365_batch(
    Y: np.ndarray,
    tau,
    w0: float = 1.0,
    w2: float = 1e-3,
    use_ixs: np.ndarray | None = None,
    num_harmonics: int = 3,
    period: float = PERIOD_DAYS,
    admm_iters: int = 30000,
    rho: float = 0.1,
):
    """Batched D2: solve ``tl1_l2d2p365`` for J series at once.

    ``Y`` is (T, J) — one column per independent series on a shared time
    axis; ``tau`` is a scalar or a length-J vector; ``use_ixs`` an
    optional (T, J) boolean mask (AND-ed with finiteness). Returns
    (S_seas (T, J), obj (J,)).

    Same convex problem per column as :func:`solve_tl1_l2d2p365`, but
    solved as a penalized quantile regression by a batched Mehrotra
    predictor-corrector interior-point method. With the residual split
    r = u - v (u, v >= 0) the problem is

        min  w0 (tau 1'u + (1-tau) 1'v) + th' Q th
        s.t. B th + u - v = y   on the use set,

    and each Newton step reduces — after eliminating (u, v, z_u, z_v) —
    to one p x p normal-equation solve per column with a diagonal
    weight, formed for all columns at once with a single einsum. The
    whole fit converges in ~20-40 interior-point iterations versus
    O(10^3-10^4) first-order iterations, which removes the
    per-iteration Python overhead that dominated fleet scoring
    (``admm_iters`` is kept for signature compatibility and acts as a
    safety cap scaled down to IPM counts).

    A column whose series starts at global offset d relative to the
    shared axis yields the same fitted values as a per-series fit with a
    local t=0 axis: a phase shift rotates each (sin, cos) harmonic pair
    within its own 2-D span, and the harmonic penalty is isotropic per
    pair, so both the feasible set and the objective are invariant.
    Callers may therefore stack sites with different start dates onto one
    global axis and mask the rows outside each site's range.
    """
    Y = np.asarray(Y, dtype=np.float64)
    T, J = Y.shape
    tau_v = np.broadcast_to(np.asarray(tau, dtype=np.float64), (J,)).astype(
        np.float64
    )
    M = np.isfinite(Y)
    if use_ixs is not None:
        M = M & np.asarray(use_ixs, dtype=bool)
    Mf = M.astype(np.float64)
    Y0 = np.where(M, Y, 0.0)

    B = trig_basis(T, num_harmonics, period)
    q = harmonic_penalty(num_harmonics, w2, period) + 1e-12
    nm = np.maximum(Mf.sum(axis=0), 1.0)  # valid rows per column

    # Whitened coordinates, shared across the batch: B = U0 S0 V0', keep
    # directions with non-negligible singular values, fit c with
    # B th = U0 c and penalty Qw = W' diag(q) W (W = V0 / s0). Short
    # series against the yearly basis make cond(B'B) ~ 1e14 — the raw-
    # coordinate Newton systems stall; in whitened coordinates the masked
    # Gram is a row-subset of an orthonormal matrix. Dropped directions
    # carry O(sv_threshold) fitted-value mass at bounded coefficients, so
    # truncation is far below the reference solver tolerances.
    U0, s0, V0t = np.linalg.svd(B, full_matrices=False)
    keep = s0 > 1e-7 * (s0[0] if len(s0) else 1.0)
    U0, s0, V0t = U0[:, keep], s0[keep], V0t[keep]
    Wmap = V0t.T / s0
    r = U0.shape[1]
    Qw = (Wmap.T * q) @ Wmap
    Qw2 = 2.0 * Qw

    y_scale = max(1.0, float(np.abs(Y0).max()) if Y0.size else 1.0)
    cu = (w0 * tau_v)[None, :]  # dual box: -cv <= d <= cu
    cv = (w0 * (1.0 - tau_v))[None, :]

    # warm start: ridge LS fit per column for c; residual split for u, v
    G0 = np.einsum("tp,tj,tq->jpq", U0, Mf, U0, optimize=True)
    H0 = G0 + Qw2[None, :, :]
    H0[:, np.arange(r), np.arange(r)] += 1e-9
    C = np.linalg.solve(H0, (U0.T @ Y0).T[:, :, None])[:, :, 0].T  # (r, J)
    R0 = Mf * (Y0 - U0 @ C)
    pad = 0.1 * y_scale
    u = np.where(M, np.maximum(R0, 0.0) + pad, 1.0)
    v = np.where(M, np.maximum(-R0, 0.0) + pad, 1.0)
    d = np.zeros((T, J))
    zu = np.where(M, np.broadcast_to(cu, (T, J)), 1.0).copy()
    zv = np.where(M, np.broadcast_to(cv, (T, J)), 1.0).copy()

    eye_r = np.arange(r)
    max_ipm = max(30, min(200, admm_iters // 100))
    done = np.zeros(J, dtype=bool)
    mu = np.full(J, np.inf)
    stall = 0
    for _ in range(max_ipm):
        r_p = Mf * (U0 @ C + u - v - Y0)
        r_dc = Qw2 @ C - U0.T @ (Mf * d)
        Fu = Mf * (zu - cu + d)
        Fv = Mf * (zv - cv - d)
        mu_prev = mu
        mu = (Mf * (u * zu + v * zv)).sum(axis=0) / (2.0 * nm)
        prim = np.max(np.abs(r_p), axis=0, initial=0.0)
        dual = np.max(np.abs(r_dc), axis=0, initial=0.0)
        box = np.maximum(
            np.max(np.abs(Fu), axis=0, initial=0.0),
            np.max(np.abs(Fv), axis=0, initial=0.0),
        )
        done = (
            (mu < 1e-10 * y_scale)
            & (prim < 1e-9 * y_scale)
            & (dual < 1e-8 * y_scale)
            & (box < 1e-8)
        )
        if done.all():
            break
        # stall break: complementarity no longer shrinking on any active
        # column — the iterate is as converged as FP arithmetic allows
        # (well below fixture tolerances); do not burn the remaining
        # iteration budget
        if np.all(done | (mu > 0.9 * mu_prev)):
            stall += 1
            if stall >= 5:
                break
        else:
            stall = 0

        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            Wd = u / zu + v / zv
        # clamp the complementarity weights: near-converged columns drive
        # u/zu or v/zv to 0 or inf, and ONE degenerate column would make
        # the whole batched np.linalg.solve raise
        Wd = np.where(np.isfinite(Wd), Wd, 1e14)
        np.clip(Wd, 1e-12, 1e14, out=Wd)
        Dinv = Mf / Wd
        Hj = np.einsum("tp,tj,tq->jpq", U0, Dinv, U0, optimize=True)
        Hj += Qw2[None, :, :]
        Hj[:, eye_r, eye_r] += 1e-12 * (
            1.0 + Hj[:, eye_r, eye_r].max(axis=1)[:, None]
        )

        def newton(tu, tv):
            g = Mf * (
                -r_p
                - (tu - u * zu + u * Fu) / zu
                + (tv - v * zv + v * Fv) / zv
            )
            rhs = -r_dc + U0.T @ (Dinv * g)
            try:
                dc = np.linalg.solve(Hj, rhs.T[:, :, None])[:, :, 0].T
            except np.linalg.LinAlgError:
                # last-ditch: heavy shared ridge (answers for healthy
                # columns move O(ridge); degenerate ones get a usable
                # direction instead of killing the whole batch)
                Hj2 = Hj.copy()
                Hj2[:, eye_r, eye_r] += 1e-6 * (
                    1.0 + Hj2[:, eye_r, eye_r].max(axis=1)[:, None]
                )
                dc = np.linalg.solve(Hj2, rhs.T[:, :, None])[:, :, 0].T
            dd = Dinv * (g - U0 @ dc)
            dzu = Mf * (-Fu - dd)
            dzv = Mf * (-Fv + dd)
            du = Mf * (tu - u * zu - u * dzu) / zu
            dv = Mf * (tv - v * zv - v * dzv) / zv
            return dc, dd, du, dv, dzu, dzv

        def steplen(x, dx):
            with np.errstate(divide="ignore", invalid="ignore"):
                rr = np.where(M & (dx < 0), -x / dx, np.inf)
            return np.minimum(1.0, 0.99 * rr.min(axis=0, initial=np.inf))

        # predictor
        zero = np.zeros((T, J))
        dc_a, dd_a, du_a, dv_a, dzu_a, dzv_a = newton(zero, zero)
        ap = np.minimum(steplen(u, du_a), steplen(v, dv_a))
        ad = np.minimum(steplen(zu, dzu_a), steplen(zv, dzv_a))
        mu_aff = (
            Mf
            * ((u + ap * du_a) * (zu + ad * dzu_a)
               + (v + ap * dv_a) * (zv + ad * dzv_a))
        ).sum(axis=0) / (2.0 * nm)
        with np.errstate(divide="ignore", invalid="ignore"):
            sigma = np.where(mu > 0, (mu_aff / np.maximum(mu, 1e-300)) ** 3, 0.0)
        sigma = np.clip(sigma, 0.0, 1.0)
        # corrector
        tgt = (sigma * mu)[None, :]
        tu = Mf * (tgt - du_a * dzu_a)
        tv = Mf * (tgt - dv_a * dzv_a)
        dc, dd, du, dv, dzu, dzv = newton(tu, tv)
        ap = np.minimum(steplen(u, du), steplen(v, dv))
        ad = np.minimum(steplen(zu, dzu), steplen(zv, dzv))
        # freeze converged columns
        ap = np.where(done, 0.0, ap)[None, :]
        ad = np.where(done, 0.0, ad)[None, :]
        C = C + ap * dc
        u = u + ap * du
        v = v + ap * dv
        d = d + ad * dd
        zu = zu + ad * dzu
        zv = zv + ad * dzv

    TH = Wmap @ C
    S_seas = U0 @ C
    Rfin = Mf * (Y0 - S_seas)
    pin = np.where(Rfin >= 0, tau_v[None, :] * Rfin, (tau_v - 1.0)[None, :] * Rfin)
    obj = w0 * pin.sum(axis=0) + np.einsum("pj,p,pj->j", TH, q, TH)
    return S_seas, obj


def pinball_regression(
    X: np.ndarray,
    y: np.ndarray,
    tau: float = 0.9,
    pen_diag: np.ndarray | None = None,
    max_ipm: int = 60,
):
    """Penalized quantile regression on an ARBITRARY design matrix:

        min  sum_i pinball_tau(y_i - X_i beta) + beta' diag(pen) beta

    by the same batched Mehrotra IPM as :func:`solve_tl1_l2d2p365_batch`
    (residual split r = u - v, p x p Newton systems), whitened through
    the SVD of X so near-collinear designs (short series, one-hot regime
    blocks) stay solvable. NaNs in ``y`` are excluded. Returns beta.

    This is the envelope-fitting core of the loss-factor model
    (solvers/soiling.py): at a high tau the fit rides the upper envelope
    of log energy, which nonpositive components (soiling) cannot pull
    down — the identification mechanism of the reference's SumQuantile
    loss (loss_factor_analysis.py:491).
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    use = np.isfinite(y)
    Xu = X[use]
    yu = y[use]
    p = X.shape[1]
    if pen_diag is None:
        pen_diag = np.zeros(p)
    pen_diag = np.asarray(pen_diag, dtype=np.float64) + 1e-12

    U0, s0, V0t = np.linalg.svd(Xu, full_matrices=False)
    keep = s0 > 1e-10 * (s0[0] if len(s0) else 1.0)
    U0, s0, V0t = U0[:, keep], s0[keep], V0t[keep]
    Wmap = V0t.T / s0
    Qw = (Wmap.T * pen_diag) @ Wmap

    # reuse the batched solver's IPM on the whitened design by treating
    # the whitened problem as a "basis fit" with J=1
    S1, _obj, C = _pinball_ipm_whitened(
        U0, Qw, yu[:, None], np.full(1, tau), max_ipm=max_ipm
    )
    return Wmap @ C[:, 0]


def _pinball_ipm_whitened(U0, Qw, Y, tau_v, w0=1.0, max_ipm=200):
    """Shared IPM core: pinball fit of columns of Y on the orthonormal
    design U0 with quadratic penalty Qw in whitened coordinates. All
    rows are used (callers pre-filter NaNs). Returns (fits, obj, C)."""
    T, J = Y.shape
    r = U0.shape[1]
    nm = float(T)
    y_scale = max(1.0, float(np.abs(Y).max()) if Y.size else 1.0)
    cu = (w0 * tau_v)[None, :]
    cv = (w0 * (1.0 - tau_v))[None, :]
    Qw2 = 2.0 * Qw

    H0 = U0.T @ U0 + Qw2 + 1e-9 * np.eye(r)
    C = np.linalg.solve(H0, U0.T @ Y)
    R0 = Y - U0 @ C
    pad = 0.1 * y_scale
    u = np.maximum(R0, 0.0) + pad
    v = np.maximum(-R0, 0.0) + pad
    d = np.zeros((T, J))
    zu = np.broadcast_to(cu, (T, J)).copy()
    zv = np.broadcast_to(cv, (T, J)).copy()
    eye_r = np.arange(r)
    done = np.zeros(J, dtype=bool)
    mu = np.full(J, np.inf)
    stall = 0
    for _ in range(max_ipm):
        r_p = U0 @ C + u - v - Y
        r_dc = Qw2 @ C - U0.T @ d
        Fu = zu - cu + d
        Fv = zv - cv - d
        mu_prev = mu
        mu = (u * zu + v * zv).sum(axis=0) / (2.0 * nm)
        prim = np.max(np.abs(r_p), axis=0, initial=0.0)
        dual = np.max(np.abs(r_dc), axis=0, initial=0.0)
        box = np.maximum(
            np.max(np.abs(Fu), axis=0, initial=0.0),
            np.max(np.abs(Fv), axis=0, initial=0.0),
        )
        done = (
            (mu < 1e-10 * y_scale)
            & (prim < 1e-9 * y_scale)
            & (dual < 1e-8 * y_scale)
            & (box < 1e-8)
        )
        if done.all():
            break
        if np.all(done | (mu > 0.9 * mu_prev)):
            stall += 1
            if stall >= 5:
                break
        else:
            stall = 0
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            Wd = u / zu + v / zv
        Wd = np.where(np.isfinite(Wd), Wd, 1e14)
        np.clip(Wd, 1e-12, 1e14, out=Wd)
        Dinv = 1.0 / Wd
        Hj = np.einsum("tp,tj,tq->jpq", U0, Dinv, U0, optimize=True)
        Hj += Qw2[None, :, :]
        Hj[:, eye_r, eye_r] += 1e-12 * (
            1.0 + Hj[:, eye_r, eye_r].max(axis=1)[:, None]
        )

        def newton(tu, tv):
            g = (
                -r_p
                - (tu - u * zu + u * Fu) / zu
                + (tv - v * zv + v * Fv) / zv
            )
            rhs = -r_dc + U0.T @ (Dinv * g)
            try:
                dc = np.linalg.solve(Hj, rhs.T[:, :, None])[:, :, 0].T
            except np.linalg.LinAlgError:
                Hj2 = Hj.copy()
                Hj2[:, eye_r, eye_r] += 1e-6 * (
                    1.0 + Hj2[:, eye_r, eye_r].max(axis=1)[:, None]
                )
                dc = np.linalg.solve(Hj2, rhs.T[:, :, None])[:, :, 0].T
            dd = Dinv * (g - U0 @ dc)
            dzu = -Fu - dd
            dzv = -Fv + dd
            du = (tu - u * zu - u * dzu) / zu
            dv = (tv - v * zv - v * dzv) / zv
            return dc, dd, du, dv, dzu, dzv

        def steplen(x, dx):
            with np.errstate(divide="ignore", invalid="ignore"):
                rr = np.where(dx < 0, -x / dx, np.inf)
            return np.minimum(1.0, 0.99 * rr.min(axis=0, initial=np.inf))

        zero = np.zeros((T, J))
        dc_a, dd_a, du_a, dv_a, dzu_a, dzv_a = newton(zero, zero)
        ap = np.minimum(steplen(u, du_a), steplen(v, dv_a))
        ad = np.minimum(steplen(zu, dzu_a), steplen(zv, dzv_a))
        mu_aff = (
            (u + ap * du_a) * (zu + ad * dzu_a)
            + (v + ap * dv_a) * (zv + ad * dzv_a)
        ).sum(axis=0) / (2.0 * nm)
        with np.errstate(divide="ignore", invalid="ignore"):
            sigma = np.where(mu > 0, (mu_aff / np.maximum(mu, 1e-300)) ** 3, 0.0)
        sigma = np.clip(sigma, 0.0, 1.0)
        tgt = (sigma * mu)[None, :]
        tu = tgt - du_a * dzu_a
        tv = tgt - dv_a * dzv_a
        dc, dd, du, dv, dzu, dzv = newton(tu, tv)
        ap = np.minimum(steplen(u, du), steplen(v, dv))
        ad = np.minimum(steplen(zu, dzu), steplen(zv, dzv))
        ap = np.where(done, 0.0, ap)[None, :]
        ad = np.where(done, 0.0, ad)[None, :]
        C = C + ap * dc
        u = u + ap * du
        v = v + ap * dv
        d = d + ad * dd
        zu = zu + ad * dzu
        zv = zv + ad * dzv

    fits = U0 @ C
    R = Y - fits
    pin = np.where(R >= 0, tau_v[None, :] * R, (tau_v - 1.0)[None, :] * R)
    obj = w0 * pin.sum(axis=0) + np.einsum("pj,pq,qj->j", C, Qw, C)
    return fits, obj, C


# ---------------------------------------------------------------------------
# interior-point QP (Mehrotra predictor-corrector)
# ---------------------------------------------------------------------------

def ipm_qp(P, q, G, h, max_iters=100, tol=1e-10, center_iters=0,
           center_mu=1e-9):
    """Minimize 1/2 v'Pv + q'v  s.t.  Gv <= h, by a standard primal-dual
    predictor-corrector interior-point method (textbook Mehrotra).

    Used where the l1 problem has a degenerate optimal face: the central
    path converges to the face's analytic center, matching what a conic
    interior-point solver (the reference's CLARABEL) returns, whereas
    first-order methods pick an arbitrary face point.
    """
    n = len(q)
    m = len(h)
    v = np.zeros(n)
    s = np.maximum(h - G @ v, 1.0)
    z = np.ones(m)
    # scale-aware stopping: the absolute tol alone never fires on
    # problems whose natural scale is far from 1, so the loop used to
    # burn all max_iters; per-LAPACK-call overhead (not flops) dominates
    # at fleet-short series sizes, so each saved iteration matters
    scale = max(
        1.0,
        float(np.abs(q).max(), ) if n else 1.0,
        float(np.abs(h).max()) if m else 1.0,
    )
    # relative tolerance scales with the problem data; for scale ~1 it
    # coincides with the caller's absolute tol (no silent loosening)
    rtol = tol * scale
    mu_prev = np.inf
    stall = 0
    for _ in range(max_iters):
        r_d = P @ v + q + G.T @ z
        r_p = G @ v + s - h
        mu = s @ z / m
        err = max(np.abs(r_d).max(), np.abs(r_p).max(), mu)
        if err < max(tol, rtol):
            break
        # stall break: on a degenerate face mu stops contracting long
        # before the tolerances fire; only valid once the iterate is
        # already within a few orders of the requested tolerance — a
        # mid-solve damped phase must keep iterating, not return garbage
        if err < 1e3 * max(tol, rtol) and mu > 0.9 * mu_prev:
            stall += 1
            if stall >= 5:
                break
        else:
            stall = 0
        mu_prev = mu
        w = z / s
        H = P + (G.T * w) @ G
        H[np.arange(n), np.arange(n)] += 1e-13 * (1.0 + np.trace(H) / n)
        # one factorization per iteration, applied to both predictor and
        # corrector rhs. Cholesky FIRST: it is the positive-definiteness
        # detector (LU-based inv silently "succeeds" on an indefinite
        # Hessian near convergence); the inverse is then computed from
        # the (ridged, if needed) PD matrix — 2 LAPACK calls/iter vs the
        # historical 5.
        try:
            np.linalg.cholesky(H)
        except np.linalg.LinAlgError:
            H = H + 1e-9 * np.trace(H) / n * np.eye(n)
        Hinv = np.linalg.inv(H)

        grad = P @ v + q

        def solve_kkt(rc):
            # Newton direction with complementarity rhs  z*ds + s*dz = rc - s*z
            rhs = -grad - G.T @ (w * r_p + rc / s)
            dv = Hinv @ rhs
            ds = -r_p - G @ dv
            dz = (rc - z * ds) / s - z
            return dv, ds, dz

        # affine (predictor) step
        dv_a, ds_a, dz_a = solve_kkt(np.zeros(m))
        a_p = min(1.0, *(0.999 * (-s[ds_a < 0] / ds_a[ds_a < 0])
                         if np.any(ds_a < 0) else [1.0]))
        a_d = min(1.0, *(0.999 * (-z[dz_a < 0] / dz_a[dz_a < 0])
                         if np.any(dz_a < 0) else [1.0]))
        mu_aff = (s + a_p * ds_a) @ (z + a_d * dz_a) / m
        sigma = (mu_aff / mu) ** 3
        # corrector
        rc = sigma * mu - ds_a * dz_a
        dv, ds, dz = solve_kkt(rc)
        a_p = min(1.0, *(0.999 * (-s[ds < 0] / ds[ds < 0])
                         if np.any(ds < 0) else [1.0]))
        a_d = min(1.0, *(0.999 * (-z[dz < 0] / dz[dz < 0])
                         if np.any(dz < 0) else [1.0]))
        v = v + a_p * dv
        s = s + a_p * ds
        z = z + a_d * dz
    # optional pure-centering finish: on a degenerate optimal face Mehrotra
    # steps can drift off the central path; sigma=1 steps at a small fixed
    # mu pull the iterate back to the path (whose limit is the analytic
    # center of the face — the point a conic IPM reports).
    for _ in range(center_iters):
        r_p = G @ v + s - h
        w = z / s
        H = P + (G.T * w) @ G
        H[np.arange(n), np.arange(n)] += 1e-13 * (1.0 + np.trace(H) / n)
        try:
            Hinv = np.linalg.inv(H)
        except np.linalg.LinAlgError:
            Hinv = np.linalg.inv(H + 1e-9 * np.trace(H) / n * np.eye(n))
        grad = P @ v + q
        rc = np.full(len(h), center_mu)
        rhs = -grad - G.T @ (w * r_p + rc / s)
        dv = Hinv @ rhs
        ds = -r_p - G @ dv
        dz = (rc - z * ds) / s - z
        a_p = min(1.0, *(0.999 * (-s[ds < 0] / ds[ds < 0])
                         if np.any(ds < 0) else [1.0]))
        a_d = min(1.0, *(0.999 * (-z[dz < 0] / dz[dz < 0])
                         if np.any(dz < 0) else [1.0]))
        a = min(a_p, a_d)
        v = v + a * dv
        s = s + a * ds
        z = z + a * dz
    return v


# ---------------------------------------------------------------------------
# D3: l1_pwc_smoothper_trend
# ---------------------------------------------------------------------------

def solve_l1_pwc_smoothper_trend(
    y: np.ndarray,
    use_ixs: np.ndarray | None = None,
    w2: float = 2e1,
    w3: float = 1.0,
    w4: float = 1e1,
    num_harmonics: int = 6,
    period: float = PERIOD_DAYS,
    admm_iters: int = 15000,
    rho: float = 0.01,
    n_reweight: int = 1,
    reweight_eps: float = 0.1,
    method: str = "admm",
):
    """Reference capacity-change model (_cvx_signal_decompositions.py:193-289):

    min (1/T)||e||_1 + (w2/(T-1)) sum tvw_i |(D1 x2)_i| + z3' Q3 z3
        + w4 * T * beta^2
    s.t. e = y - x2 - B z3 - beta*t on the use set,
         beta*365 in [-0.2, 0.05],
    followed by ``n_reweight`` passes of tvw = 1/(eps + |D1 x2|).

    Returns (s_hat, s_seas, s_lin, obj).
    """
    y = np.asarray(y, dtype=np.float64)
    T = len(y)
    use = np.isfinite(y)
    if use_ixs is not None:
        use &= np.asarray(use_ixs, dtype=bool)
    yu = y[use]
    t_full = np.arange(T, dtype=np.float64)

    # Short series: the dense interior-point QP is tiny (~(2T+pB)^2 per
    # Newton step, ~30 steps) while the ADMM's 15k fixed-rate iterations
    # are pure Python overhead — a 30x wall-clock swing per site on
    # month-scale fleet slices. Both converge to the same optimum (the
    # IPM to the analytic center of any degenerate face, matching the
    # reference's conic solver); the ADMM+polish stays the default for
    # long series where the dense QP would be O(T^3) per step.
    if method == "admm" and T <= 200:
        method = "ipm"

    B = trig_basis(T, num_harmonics, period, include_const=False)
    q3 = harmonic_penalty(num_harmonics, w3, period, include_const=False,
                          normalized_basis=False)
    pB = B.shape[1]
    D = _diff1(T)
    m = D.shape[0]
    lo, hi = -0.2 / 365.0, 0.05 / 365.0

    tvw = np.ones(m)
    x2 = np.zeros(T)
    z3 = np.zeros(pB)
    beta = 0.0
    for _pass in range(n_reweight + 1):
        if method == "ipm":
            # interior-point: the l1 parts make the optimal face degenerate
            # (verified: ADMM reaches the same objective at rho-dependent
            # face points); the central path selects the analytic center,
            # matching the reference's conic solver.
            x2, z3, beta = _ipm_pwc_pass(
                yu, use, B, q3, D, tvw, w2, w4, lo, hi)
            # support polish (same as the ADMM branch): the IPM's
            # stall-tolerance iterate carries O(1e-2) wiggle along the
            # weakly-determined plateau directions, which makes the
            # "piecewise constant" component not exactly constant and
            # lets bin-edge days flip capacity labels; fixing the
            # detected jump support and re-solving the restricted
            # equality-constrained problem restores exact plateaus
            e_res = yu - (x2 + B @ z3 + beta * t_full)[use]
            splits = (e_res, np.diff(x2), beta)
            admm_u = np.concatenate([x2, z3, [beta]])
            px2, pz3, pbeta, ok = _polish_pwc(
                yu, use, B, q3, D, tvw, w2, w4, lo, hi, splits,
                admm_u=admm_u)
            if ok:
                x2, z3, beta = px2, pz3, pbeta
        else:
            x2, z3, beta, splits = _admm_pwc_smoothper_trend(
                yu, use, B, q3, D, tvw, w2, w4, lo, hi, rho, admm_iters)
            admm_u = np.concatenate([x2, z3, [beta]])
            px2, pz3, pbeta, ok = _polish_pwc(
                yu, use, B, q3, D, tvw, w2, w4, lo, hi, splits, admm_u=admm_u)
            if ok:
                x2, z3, beta = px2, pz3, pbeta
        if _pass < n_reweight:
            tvw = 1.0 / (reweight_eps + np.abs(np.diff(x2)))

    s_seas = B @ z3
    s_lin = beta * t_full
    e = yu - (x2 + s_seas + s_lin)[use]
    obj = float(np.sum(np.abs(e)) / T
                + w2 * np.sum(tvw * np.abs(np.diff(x2))) / (T - 1)
                + z3 @ (q3 * z3) + w4 * T * beta ** 2)
    return x2, s_seas, s_lin, obj


def _ipm_pwc_pass(yu, use, B, q3, D, tvw, w2, w4, lo, hi):
    """One reweighting pass of the D3 problem as an inequality-form QP:
    v = [x2; z3; beta; t_e; t_d] with abs-epigraph rows (the same
    inequality set the reference's CVXPY canonicalization produces)."""
    T = B.shape[0]
    pB = B.shape[1]
    nuse = int(use.sum())
    t_full = np.arange(T, dtype=np.float64)
    Xr = np.hstack([np.eye(T)[use], B[use], t_full[use, None]])
    m1 = D.shape[0]
    nx = T + pB + 1
    n = nx + nuse + m1
    P = np.zeros((n, n))
    P[T:T + pB, T:T + pB] = 2.0 * np.diag(q3)
    P[nx - 1, nx - 1] = 2.0 * w4 * T
    q = np.zeros(n)
    q[nx:nx + nuse] = 1.0 / T
    q[nx + nuse:] = w2 * tvw / (T - 1.0)

    G = np.zeros((2 * nuse + 2 * m1 + 2, n))
    h = np.zeros(2 * nuse + 2 * m1 + 2)
    # r - te <= 0  ->  -Xr v_x - te <= -y
    G[:nuse, :nx] = -Xr
    G[:nuse, nx:nx + nuse] = -np.eye(nuse)
    h[:nuse] = -yu
    # -r - te <= 0  ->  Xr v_x - te <= y
    G[nuse:2 * nuse, :nx] = Xr
    G[nuse:2 * nuse, nx:nx + nuse] = -np.eye(nuse)
    h[nuse:2 * nuse] = yu
    r0 = 2 * nuse
    G[r0:r0 + m1, :T] = D
    G[r0:r0 + m1, nx + nuse:] = -np.eye(m1)
    G[r0 + m1:r0 + 2 * m1, :T] = -D
    G[r0 + m1:r0 + 2 * m1, nx + nuse:] = -np.eye(m1)
    G[-2, nx - 1] = 1.0
    h[-2] = hi
    G[-1, nx - 1] = -1.0
    h[-1] = -lo
    # tol=1e-8: the consumers round the pwc level into 0.05 capacity
    # bins (daily_flags custom_round), so 1e-8-relative optimality is
    # 5+ orders beyond what can move a label, and it lets the plateau
    # stall-exit fire at 1e-5-relative instead of grinding to 1e-10
    v = ipm_qp(P, q, G, h, tol=1e-8, center_iters=15, center_mu=1e-8)
    return v[:T], v[T:T + pB], float(v[nx - 1])


def _admm_pwc_smoothper_trend(yu, use, B, q3, D, tvw, w2, w4, lo, hi,
                              rho, admm_iters):
    T = B.shape[0]
    pB = B.shape[1]
    m = D.shape[0]
    t_full = np.arange(T, dtype=np.float64)
    # u = [x2 (T) ; z3 (pB) ; beta (1)]
    nu = T + pB + 1
    # residual map on use set: r(u) = y - x2 - B z3 - beta t
    Xr = np.hstack([np.eye(T)[use], B[use], t_full[use, None]])
    Gtv = np.hstack([D, np.zeros((m, pB + 1))])
    gb = np.zeros(nu)
    gb[-1] = 1.0

    P = np.zeros((nu, nu))
    P[T:T + pB, T:T + pB] = 2.0 * np.diag(q3)
    P[-1, -1] = 2.0 * w4 * T
    K = P + rho * (Xr.T @ Xr + Gtv.T @ Gtv + np.outer(gb, gb))
    Kinv = np.linalg.inv(K)

    y_scale = max(1.0, float(np.abs(yu).max()) if len(yu) else 1.0)
    ze = np.zeros(len(yu)); se = np.zeros(len(yu))
    zt = np.zeros(m); st = np.zeros(m)
    zb = 0.0; sb = 0.0
    alpha = 1.8
    ke = 1.0 / (T * rho)
    kt = w2 * tvw / ((T - 1) * rho)
    obj_prev = np.inf
    obj_stable = 0
    for it in range(admm_iters):
        rhs = rho * (Xr.T @ (yu - ze + se) + Gtv.T @ (zt - st) + gb * (zb - sb))
        u = Kinv @ rhs
        r = yu - Xr @ u
        Dx = Gtv @ u
        bet = u[-1]
        rh = alpha * r + (1.0 - alpha) * ze
        ze_prev = ze
        ze = _soft(rh + se, ke); se += rh - ze
        Dh = alpha * Dx + (1.0 - alpha) * zt
        zt_prev = zt
        zt = _soft(Dh + st, kt); st += Dh - zt
        bh = alpha * bet + (1.0 - alpha) * zb
        zb = min(max(bh + sb, lo), hi); sb += bh - zb
        if it % 25 == 24:
            if _admm_converged(r - ze, ze - ze_prev, rho,
                               tol=1e-8 * y_scale) and _admm_converged(
                Dx - zt, zt - zt_prev, rho, tol=1e-8 * y_scale
            ):
                break
            # objective-plateau stop (same rationale as the D4 solver):
            # the support polish downstream recovers the exact optimum
            # from the detected pattern, so iterating only has to get
            # the SUPPORT right — once the true objective stops moving,
            # further fixed-rate dual refinement is wasted wall time
            # (year-length fleet series otherwise burn all 15k iters).
            obj_cur = (
                np.sum(np.abs(r)) / T
                + np.sum(kt * np.abs(Dx)) * rho
                + u[T : T + pB] @ (q3 * u[T : T + pB])
                + w4 * T * bet**2
            )
            if abs(obj_prev - obj_cur) < 1e-8 * max(1.0, obj_cur):
                obj_stable += 1
                if obj_stable >= 4:
                    break
            else:
                obj_stable = 0
            obj_prev = obj_cur
    return u[:T], u[T:T + pB], float(zb), (ze, zt, zb)


def _polish_pwc(yu, use, B, q3, D, tvw, w2, w4, lo, hi, splits,
                admm_u=None):
    """Support-pattern polish: zero residuals and zero first-diffs become
    equality constraints, nonzero ones contribute their fixed-sign linear
    l1 terms, beta is pinned when at a bound. Tries several support
    thresholds and accepts the candidate only if it lowers the true
    objective (always a valid test — the objective is re-evaluated with
    real absolute values, not the linearized surrogate)."""
    ze, zt, zb = splits
    T = B.shape[0]
    pB = B.shape[1]
    t_full = np.arange(T, dtype=np.float64)
    Xr = np.hstack([np.eye(T)[use], B[use], t_full[use, None]])
    Gtv = np.hstack([D, np.zeros((T - 1, pB + 1))])
    nu = T + pB + 1
    ke = 1.0 / T
    kt = w2 * tvw / (T - 1.0)
    beta_fixed = zb <= lo + 1e-12 or zb >= hi - 1e-12

    def true_obj(u):
        r = yu - Xr @ u
        Dx = Gtv @ u
        z3 = u[T:T + pB]
        return (ke * np.sum(np.abs(r)) + np.sum(kt * np.abs(Dx))
                + z3 @ (q3 * z3) + w4 * T * u[-1] ** 2)

    best_u = None
    best_obj = true_obj(admm_u) if admm_u is not None else np.inf
    se = max(1.0, np.abs(ze).max() if len(ze) else 1.0)
    st = max(1.0, np.abs(zt).max() if len(zt) else 1.0)
    P = np.zeros((nu, nu))
    P[:T, :T] = 1e-9 * np.eye(T)  # KKT singularity guard
    P[T:T + pB, T:T + pB] = 2.0 * np.diag(q3)
    P[-1, -1] = 2.0 * w4 * T
    for rel in (1e-3, 1e-4, 1e-5):
        act_e = np.abs(ze) > rel * se
        act_t = np.abs(zt) > rel * st
        sgn_e = np.sign(ze[act_e])
        sgn_t = np.sign(zt[act_t])
        E_rows = [Xr[~act_e], Gtv[~act_t]]
        e_rhs = [yu[~act_e], np.zeros(int((~act_t).sum()))]
        if beta_fixed:
            row = np.zeros((1, nu)); row[0, -1] = 1.0
            E_rows.append(row); e_rhs.append(np.array([zb]))
        E = np.vstack(E_rows)
        neq = E.shape[0]
        lin = -ke * (Xr[act_e].T @ sgn_e) + Gtv[act_t].T @ (kt[act_t] * sgn_t)
        K = np.zeros((nu + neq, nu + neq))
        K[:nu, :nu] = P
        K[:nu, nu:] = E.T
        K[nu:, :nu] = E
        rhs = np.concatenate([-lin, np.concatenate(e_rhs)])
        try:
            sol = np.linalg.solve(K, rhs)
        except np.linalg.LinAlgError:
            continue
        u = sol[:nu]
        if not beta_fixed and not (lo - 1e-9 <= u[-1] <= hi + 1e-9):
            continue
        o = true_obj(u)
        if o < best_obj - 1e-15:
            best_obj = o
            best_u = u
    if best_u is None:
        return None, None, None, False
    return best_u[:T], best_u[T:T + pB], float(best_u[-1]), True


# ---------------------------------------------------------------------------
# D4: l2_l1d2_constrained
# ---------------------------------------------------------------------------

def cdf_grid_points(n_finite: int, cap: int = 5000) -> int:
    """Resampled-CDF grid size for the D4 clipping fit: ~8 points per
    observation, clamped to [101, cap], then rounded up so 2*(gp-1) —
    the FFT length of the DST-based solver in
    :func:`solve_l2_l1d2_constrained` — has only {2, 3, 5} factors.
    (The reference uses a fixed 5000-point grid, clipping.py:368; the
    8x-adaptive size is this repo's refinement and the smooth rounding
    costs at most a few extra grid points.)"""
    gp = int(min(cap, max(101, 8 * n_finite)))
    target = gp - 1
    while True:
        x = target
        for f in (2, 3, 5):
            while x % f == 0:
                x //= f
        if x == 1:
            return target + 1
        target += 1


def _apply_d2(x: np.ndarray) -> np.ndarray:
    """D2 @ x as an O(n) stencil (x full length)."""
    return x[2:] - 2.0 * x[1:-1] + x[:-2]


def _apply_d2t(v: np.ndarray, n: int) -> np.ndarray:
    """D2.T @ v as an O(n) stencil (v length n-2)."""
    out = np.zeros(n)
    out[: n - 2] += v
    out[1 : n - 1] -= 2.0 * v
    out[2:] += v
    return out


def solve_l2_l1d2_constrained(
    y: np.ndarray,
    w0: float = 1.0,
    w1: float = 5.0,
    admm_iters: int = 3000,
    rho: float = 100.0,
):
    """Minimize  w0 ||y - x||^2 + w1 ||D2 x||_1  s.t. x[0]=0, x[-1]=1.

    Over-relaxed ADMM finds the kink support; an exact breakpoint polish
    (the optimum is piecewise-linear with kinks only where D2 x != 0, so
    the restricted problem is a tiny least-squares in the kink values)
    recovers the interior-point optimum. Per-iteration cost is one dense
    (T-2)^2 matvec + O(T) stencils; the polish is O(T K^2) for K kinks.

    Returns (s_hat, obj).
    """
    y = np.asarray(y, dtype=np.float64)
    T = len(y)
    m = T - 2
    fix = np.zeros(T)
    fix[-1] = 1.0
    # x-update system: (2 w0 I + rho * Ai) xf = rhs, where Ai is the
    # interior block of D2'D2. Ai == S^2 exactly, with S the Dirichlet
    # tridiagonal second-difference matrix of size m, so the system is
    # diagonalized by the orthogonal DST-I: eigenvalues of S are
    # -4 sin^2(k pi / (2(m+1))). Each solve is two length-2(m+1) real
    # FFTs — O(m log m) versus the dense O(m^2) matvec (and O(m^3)
    # inverse) this replaces, which dominated fleet scoring on the
    # reference's 5000-point CDF grid. Iterates match the dense path to
    # machine precision. Callers should prefer grid sizes with smooth
    # 2(gp-1) factorizations (see cdf_grid_points) so the FFT stays fast.
    kk = np.arange(1, m + 1)
    lam = -4.0 * np.sin(kk * np.pi / (2.0 * (m + 1))) ** 2
    den = 2.0 * w0 + rho * lam**2
    next_ = 2 * (m + 1)
    ext = np.zeros(next_)

    def _dst_solve(b):
        ext[1 : m + 1] = b
        ext[m + 2 :] = -b[::-1]
        t1 = np.fft.rfft(ext).imag[1 : m + 1]
        t1 /= den
        ext[1 : m + 1] = t1
        ext[m + 2 :] = -t1[::-1]
        return np.fft.rfft(ext).imag[1 : m + 1] / (2.0 * (m + 1))

    base = 2.0 * w0 * (y - fix)[1:-1]
    z = np.zeros(m)
    s = np.zeros(m)
    alpha = 1.8
    x = fix.copy()
    obj_prev = np.inf
    obj_stable = 0
    for it in range(admm_iters):
        rhs_full = _apply_d2t(z - s - _apply_d2(fix), T)
        xf = _dst_solve(base + rho * rhs_full[1:-1])
        x = fix.copy()
        x[1:-1] = xf
        Dx = _apply_d2(x)
        Dh = alpha * Dx + (1.0 - alpha) * z
        z_prev = z
        z = _soft(Dh + s, w1 / rho)
        s += Dh - z
        if it % 25 == 24:
            if _admm_converged(Dx - z, z - z_prev, rho):
                break
            # objective-plateau stop: the breakpoint polish below recovers
            # the exact optimum once the iterate is near-optimal, so
            # iterate only until the true objective stops moving.
            obj_cur = w0 * float(np.sum((y - x) ** 2)) + w1 * float(
                np.sum(np.abs(Dx))
            )
            if abs(obj_prev - obj_cur) < 1e-9 * max(1.0, obj_cur):
                obj_stable += 1
                if obj_stable >= 4:
                    break
            else:
                obj_stable = 0
            obj_prev = obj_cur

    def true_obj(xx):
        return float(
            w0 * np.sum((y - xx) ** 2) + w1 * np.sum(np.abs(_apply_d2(xx)))
        )

    best = true_obj(x)
    sz = max(1.0, np.abs(z).max() if m else 1.0)
    for rel in (1e-3, 1e-4, 1e-5, 1e-6):
        cand = _polish_l1d2_breakpoints(y, z, w0, w1, rel * sz)
        if cand is None:
            continue
        o = true_obj(cand)
        if o < best - 1e-15:
            best = o
            x = cand
    obj = true_obj(x)
    return x, obj


def _apply_d2t_d2_interior(T: int) -> np.ndarray:
    """Interior (T-2)^2 block of D2.T @ D2, assembled from its stencil."""
    # accumulate sum_r outer(row_r, row_r) over the D2 stencil rows
    # (e_r - 2 e_{r+1} + e_{r+2}) without materializing dense D2
    A = np.zeros((T, T))
    rows = np.arange(T - 2)
    for o1, c1 in ((0, 1.0), (1, -2.0), (2, 1.0)):
        for o2, c2 in ((0, 1.0), (1, -2.0), (2, 1.0)):
            np.add.at(A, (rows + o1, rows + o2), c1 * c2)
    return A[1:-1, 1:-1]


def _polish_l1d2_breakpoints(y, z, w0, w1, tol):
    """Exact restricted solve: fix the kink support from z, parameterize x
    by its values at the kinks (piecewise-linear between breakpoints,
    endpoints pinned to 0 and 1), minimize the now-smooth objective."""
    T = len(y)
    active = np.abs(z) > tol
    kinks = np.where(active)[0] + 1  # interior positions of nonzero D2
    sgn = np.sign(z[active])
    K = len(kinks)
    bp = np.concatenate([[0], kinks, [T - 1]]).astype(np.int64)
    # interpolation: x = M @ v + m0, v = x at interior kinks; endpoints 0, 1
    t = np.arange(T, dtype=np.float64)
    M = np.zeros((T, K))
    m0 = np.zeros(T)
    vals_fixed = {0: 0.0, T - 1: 1.0}
    for j in range(len(bp) - 1):
        a, b = bp[j], bp[j + 1]
        seg = slice(a, b + 1)
        alpha = (t[seg] - a) / float(b - a)
        for pos, wcol in ((j, 1.0 - alpha), (j + 1, alpha)):
            p = bp[pos]
            if p in vals_fixed:
                m0[seg] += vals_fixed[p] * wcol
            else:
                M[seg, pos - 1] += wcol
    if K == 0:
        return m0
    # linear term from the active l1 pieces: w1 * sgn' D2_active x
    g = np.zeros(T)
    for i, kk in enumerate(np.where(active)[0]):
        g[kk] += w1 * sgn[i]
        g[kk + 1] -= 2.0 * w1 * sgn[i]
        g[kk + 2] += w1 * sgn[i]
    lin = M.T @ g
    A = 2.0 * w0 * (M.T @ M)
    rhs = 2.0 * w0 * (M.T @ (y - m0)) - lin
    try:
        v = np.linalg.solve(A + 1e-12 * np.eye(K), rhs)
    except np.linalg.LinAlgError:
        return None
    return M @ v + m0
