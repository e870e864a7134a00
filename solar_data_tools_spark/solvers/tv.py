"""1-D total-variation denoising (exact, direct).

Implements the taut-string / direct TV-L2 algorithm published by Condat
(IEEE SPL 2013, "A Direct Algorithm for 1-D Total Variation Denoising") —
O(n) typical, exact solution of

    min_x  0.5 * ||y - x||_2^2  +  lam * sum_i |x[i+1] - x[i]|

This is the piecewise-constant component engine for the reference's
``l2_l1d1_l2d2p365`` family (SURVEY §2.8 D1/D3): the reference solves the
same objective inside a cone program; a direct algorithm is deterministic,
dependency-free, and fast enough to run per-site inside ``applyInPandas``.
"""

from __future__ import annotations

import numpy as np


def tv1d_denoise(y: np.ndarray, lam: float) -> np.ndarray:
    """Exact TV-L2 denoising of a 1-D signal (NaNs not allowed)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    x = np.empty(n, dtype=np.float64)
    if n == 0:
        return x
    if n == 1 or lam <= 0:
        return y.copy()

    # Condat 2013, Algorithm 1 (with the standard variable names)
    k = k0 = kminus = kplus = 0
    vmin = y[0] - lam
    vmax = y[0] + lam
    umin = lam
    umax = -lam
    while True:
        if k == n - 1:
            x[k] = vmin + umin
            break
        k_next = k + 1
        if y[k_next] + umin < vmin - lam:  # negative jump necessary
            x[k0 : kminus + 1] = vmin
            k = k0 = kminus = kplus = kminus + 1
            vmin = y[k]
            vmax = y[k] + 2 * lam
            umin = lam
            umax = -lam
        elif y[k_next] + umax > vmax + lam:  # positive jump necessary
            x[k0 : kplus + 1] = vmax
            k = k0 = kminus = kplus = kplus + 1
            vmin = y[k] - 2 * lam
            vmax = y[k]
            umin = lam
            umax = -lam
        else:  # no jump necessary yet
            k = k_next
            umin += y[k] - vmin
            umax += y[k] - vmax
            if umin >= lam:  # update of vmin
                vmin += (umin - lam) / (k - k0 + 1)
                umin = lam
                kminus = k
            if umax <= -lam:  # update of vmax
                vmax += (umax + lam) / (k - k0 + 1)
                umax = -lam
                kplus = k
        if k == n - 1:
            if umin < 0:
                # vmin is too high: negative jump necessary
                x[k0 : kminus + 1] = vmin
                k = k0 = kminus = kminus + 1
                vmin = y[k]
                umin = lam
                umax = y[k] + lam - vmax
            elif umax > 0:
                # vmax is too low: positive jump necessary
                x[k0 : kplus + 1] = vmax
                k = k0 = kplus = kplus + 1
                vmax = y[k]
                umax = -lam
                umin = y[k] - lam - vmin
            else:
                x[k0 : n] = vmin + umin / (k - k0 + 1)
                break
    return x


def tv1d_denoise_nan(y: np.ndarray, lam: float) -> np.ndarray:
    """TV denoise with NaN handling: fit on finite entries, propagate the
    piecewise-constant level across gaps (the reference masks missing days
    with ``use_ixs`` the same way)."""
    y = np.asarray(y, dtype=np.float64)
    mask = np.isfinite(y)
    out = np.full(len(y), np.nan)
    if mask.sum() == 0:
        return out
    fitted = tv1d_denoise(y[mask], lam)
    out[mask] = fitted
    # forward/backward fill gaps with the nearest fitted level
    idx = np.where(mask)[0]
    full = np.interp(np.arange(len(y)), idx, fitted)
    out[~mask] = full[~mask]
    return out
