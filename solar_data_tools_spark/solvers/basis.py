"""Basis-matrix construction for the signal-decomposition solver layer.

Public formulas only: sin/cos harmonic (Fourier) bases as used by the
reference's seasonal components (SURVEY.md §2.8: 3-harmonic Fourier with
period 365.2425 for D1/D2; 6 harmonics for D3). Reimplemented directly in
numpy — no dependency on the reference's helper packages.
"""

from __future__ import annotations

import numpy as np


def fourier_basis(
    t: np.ndarray,
    num_harmonics: int = 3,
    period: float = 365.2425,
    include_intercept: bool = True,
    include_trend: bool = False,
) -> np.ndarray:
    """Design matrix [1?, trend?, sin(2pi k t/P), cos(2pi k t/P) ...].

    ``t`` is typically the day index 0..n-1.
    """
    t = np.asarray(t, dtype=np.float64)
    cols = []
    if include_intercept:
        cols.append(np.ones_like(t))
    if include_trend:
        cols.append(t / max(len(t), 1))
    for k in range(1, num_harmonics + 1):
        w = 2.0 * np.pi * k * t / period
        cols.append(np.sin(w))
        cols.append(np.cos(w))
    return np.column_stack(cols)
