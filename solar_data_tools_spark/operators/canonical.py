"""Canonical long measurement table.

The reference pivots raw time series into a 2-D ``(slots_per_day, num_days)``
numpy matrix (reference: solardatatools/matrix_embedding.py:27-69) and runs
every analysis as axis-wise numpy ops. At 100 TB a materialized matrix per
site is the wrong representation; we keep one **long table**

    fact_measurement(site, ts, seq, date, slot, hod, value)

where
  - ``site``  — series key (fleet dimension; partition/bucket key),
  - ``ts``    — timestamp (tz-naive local, like the reference),
  - ``seq``   — unique row id carried from ingest so annotations computed on
                the standardized grid can be joined back to raw rows
                (reference: data_handler.py:115-121, 1076-1089),
  - ``date``  — day column ("matrix column j" == ``WHERE date = d``),
  - ``slot``  — intraday slot index ("matrix row i" == ``WHERE slot = i``),
  - ``hod``   — fractional hour of day,
  - ``value`` — the measurement.

"Column-wise" matrix ops become ``groupBy(site, date)``; "row-wise" ops
become ``groupBy(site, slot)``; element masks become boolean columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_time_columns(
    df: DataFrame,
    ts_col: str = "ts",
    sampling_seconds: int | str = 300,
) -> DataFrame:
    """Add ``date``, ``slot`` and ``hod`` derived columns.

    ``slot = seconds_since_midnight / sampling_seconds`` (integer division)
    mirrors the reference's row index into the day matrix.
    ``sampling_seconds`` may be a column NAME (per-site native cadences —
    the heterogeneous-fleet path) instead of a scalar.
    """
    ts = F.col(ts_col)
    sec_of_day = (
        F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts)
    ).cast("long")
    samp = (
        F.col(sampling_seconds)
        if isinstance(sampling_seconds, str)
        else F.lit(sampling_seconds)
    )
    return (
        df.withColumn("date", F.to_date(ts))
        .withColumn("slot", (sec_of_day / samp).cast("int"))
        .withColumn("hod", (sec_of_day / F.lit(3600.0)))
    )


def events_as_measurements(events: DataFrame, sampling_seconds: int = 300) -> DataFrame:
    """Adapt the synthetic ``events`` table to the canonical measurement shape.

    ``user_id`` plays the role of ``site`` and ``event_id`` is the stable
    ``seq`` id used for deterministic ordering and raw-row re-joins.
    """
    base = events.select(
        F.col("user_id").alias("site"),
        F.col("ts"),
        F.col("event_id").alias("seq"),
        F.col("value"),
    )
    return with_time_columns(base, "ts", sampling_seconds)


def pround(col: Column | str, digits: int = 6) -> Column:
    """Engine-portable fixed-point rounding: ``floor(x*10^d + 0.5)/10^d``,
    the exact same IEEE ops the DuckDB oracles spell out as
    ``floor((x) * 1e{d} + 0.5) / 1e{d}``.

    Engine ``round()`` builtins disagree on half-boundary doubles (Spark
    rounds the exact binary expansion via BigDecimal; DuckDB multiplies
    first, which can carry the product up to the .5 tick) — at sf0.1
    that flipped 1-in-40k rows of q30/q37, and the r07 driver caught the
    same flip on q165's small-integer ratios. Identical expressions on
    both sides are bit-equal at any scale, negatives included (both
    sides round half toward +inf — equality needs identical ops, not a
    particular tie convention). This is the ONLY rounding allowed in an
    oracle-certified projection (tests/test_certification_lint.py)."""
    if isinstance(col, str):
        col = F.col(col)
    p = F.lit(float(10**digits))
    return F.floor(col * p + F.lit(0.5)) / p


def round_float(col: Column, digits: int = 6) -> Column:
    """Round a double for order-insensitive hash comparison.

    Spark sums partition-parallel while single-node oracles sum sequentially;
    double addition is not associative, so raw sums can differ in the last
    few ulps. Rounding both sides to the same precision removes the
    nondeterminism without hiding real errors. Delegates to ``pround``
    (the portable floor pattern) — the builtin ``F.round`` is banned from
    certified projections."""
    return pround(col, digits)
