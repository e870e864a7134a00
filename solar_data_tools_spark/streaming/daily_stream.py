"""Incremental daily aggregation over a measurement stream.

Maps the batch ``daily_statistics`` core (A1/A2/A4) onto Structured
Streaming: tumbling 1-day event-time windows + watermark for late data.
The reference handles late data offline via nearest-reindex + NaN fill
(SURVEY §2.11); a watermark is the streaming-native equivalent bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_daily_stats(
    stream: DataFrame,
    slots_per_day: int = 288,
    watermark: str = "2 days",
    capacity: float | None = None,
    density_threshold: float = 0.02,
) -> DataFrame:
    """Streaming fact_daily: one row per (site, day window).

    ``capacity`` must be a known constant in streaming mode (the batch
    pipeline's per-site 95th percentile needs the full history; a streaming
    job pins it from the latest batch snapshot — standard lambda handoff).
    """
    v = F.col("value")
    cap = F.lit(capacity) if capacity is not None else F.lit(None).cast("double")
    density = (
        F.avg((v > density_threshold * cap).cast("int")).alias("density")
        if capacity is not None
        else F.lit(None).cast("double").alias("density")
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("site", F.window("ts", "1 day").alias("day_window"))
        .agg(
            (F.sum(v) * 24.0 / float(slots_per_day)).alias("energy"),
            F.max(v).alias("day_max"),
            F.count(v).alias("n_obs"),
            density,
        )
        .select(
            "site",
            F.col("day_window.start").cast("date").alias("date"),
            "energy",
            "day_max",
            "n_obs",
            "density",
        )
    )
