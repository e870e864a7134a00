"""Streaming sessionization — the stateful-operator counterpart of
``operators/sessions.sessionize``.

Uses the built-in ``session_window`` (gap-based, watermark-bounded state)
rather than a custom ``applyInPandasWithState`` handler: the built-in
keeps state JVM-side and merges sessions across micro-batches. Late rows
beyond the watermark are dropped — the batch path is the replayable
source of truth, as everywhere else in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessionize(
    stream: DataFrame,
    gap_seconds: int,
    watermark: str = "1 hour",
    site_col: str = "site",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions over a stream: one row per closed session."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(site_col),
            F.session_window(F.col(ts_col), f"{int(gap_seconds)} seconds").alias(
                "w"
            ),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("session_value"),
        )
        .select(
            site_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
