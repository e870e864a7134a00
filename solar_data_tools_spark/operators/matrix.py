"""Day-matrix export — the reference's ``make_2d`` embedding as a
driver-side utility (reference: solardatatools/matrix_embedding.py:27-69).

The engine itself never materializes per-site matrices (the canonical
long table IS the matrix, see operators/canonical.py); this export exists
for the plotting/notebook workflow every reference user has: pull ONE
site's standardized series to the driver as a (slots_per_day x num_days)
frame for heatmaps and external tools. It is deliberately a driver-side
``toPandas`` — one site's matrix is a few MB — and must never appear
inside a fleet-scale pipeline (use groupBy(site, date) aggregates there).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _find_start_end(empty_days: np.ndarray) -> tuple[int, int]:
    """First/last non-empty day (reference utilities.find_start_end):
    trims leading and trailing all-NaN columns only."""
    n = len(empty_days)
    i = 0
    while i < n and empty_days[i]:
        i += 1
    j = n
    while j > i and empty_days[j - 1]:
        j -= 1
    return i, j


def to_matrix_pandas(
    standardized: DataFrame,
    site,
    value_col: str = "value",
    ts_col: str = "ts",
    site_col: str = "site",
    trim_start: bool = False,
    trim_end: bool = False,
) -> pd.DataFrame:
    """Export one site's standardized series as a (slots x days) pandas
    frame, matching ``make_2d`` semantics exactly:

    - sampling inferred as the median timestamp delta,
    - day span from the first day (optionally trimmed) to the last
      (optionally trimmed), missing grid slots as NaN,
    - leading/trailing all-NaN days dropped (matrix_embedding.py:58-62).

    Returns a DataFrame whose index is the intraday slot time (time of
    day) and whose columns are the day dates; ``.to_numpy()`` is the
    reference's Fortran-ordered matrix content.
    """
    pdf = (
        standardized.where(F.col(site_col) == F.lit(site))
        .select(ts_col, value_col)
        .toPandas()
        .sort_values(ts_col)
        .reset_index(drop=True)
    )
    if pdf.empty:
        return pd.DataFrame()
    ts = pd.DatetimeIndex(pdf[ts_col])
    if len(ts) < 2:
        raise ValueError(
            f"site {site!r}: need >= 2 rows to infer the sampling period "
            f"(got {len(ts)})"
        )
    deltas = (ts[1:] - ts[:-1]).to_numpy()
    freq_seconds = int(np.median(deltas) / np.timedelta64(1, "s"))
    if freq_seconds <= 0 or 86400 % freq_seconds != 0:
        raise ValueError(
            f"site {site!r}: inferred sampling period {freq_seconds}s does "
            "not divide a day — standardize the series first (make_2d "
            "requires a regular grid, matrix_embedding.py:41-47)"
        )
    n_steps = int(24 * 60 * 60 / freq_seconds)

    days = ts.normalize().unique().sort_values()
    if (int(trim_start) + int(trim_end)) >= len(days):
        raise ValueError(
            f"site {site!r}: {len(days)} day(s) of data cannot satisfy "
            f"trim_start={trim_start}, trim_end={trim_end}"
        )
    start = days[1] if trim_start else days[0]
    end = days[-2] if trim_end else days[-1]
    full_index = pd.date_range(
        start=start,
        end=end + pd.Timedelta(days=1) - pd.Timedelta(seconds=freq_seconds),
        freq=pd.Timedelta(seconds=freq_seconds),
    )
    series = pd.Series(
        pdf[value_col].to_numpy(dtype=np.float64), index=ts
    ).reindex(full_index)
    D = series.to_numpy().reshape(n_steps, -1, order="F")
    day_axis = pd.date_range(start=start, end=end, freq="1D")
    empty = np.all(np.isnan(D), axis=0)
    i, j = _find_start_end(empty)
    D = D[:, i:j]
    day_axis = day_axis[i:j]
    slot_index = pd.timedelta_range(
        start=0, periods=n_steps, freq=pd.Timedelta(seconds=freq_seconds)
    )
    return pd.DataFrame(D, index=slot_index, columns=day_axis.date)
