"""Streaming sketch maintenance — the ingest-time face of the CMS
(operators/sketches.py).

A count-min sketch is a pure additive aggregate over a FIXED
``depth x width`` key space, so it streams with Spark's built-in
stateful aggregation and NO watermark: state is bounded by
``depth * width`` rows forever, regardless of how much text flows
through (the property that makes sketches the streaming-statistics
tier — compare ``streaming_first_seen``'s per-key state, which needs a
watermark to stay bounded). Emit in ``update``/``complete`` output mode;
the sketch grid at any point equals ``cms_build`` over everything
ingested so far (streaming==batch contract test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solar_data_tools_spark.operators.dedup import normalize_text
from solar_data_tools_spark.operators.sketches import _bucket


def streaming_cms(
    docs: DataFrame,
    width: int = 1024,
    depth: int = 4,
    text_col: str = "text",
    seed: int | str = 0,
) -> DataFrame:
    """Maintain a count-min sketch over a document STREAM: same bucket
    hashes, same grid, same counts as the batch ``cms_build`` — one
    stateful (d, bucket) aggregation whose state never exceeds
    ``depth * width`` rows. Point-query the materialized grid with the
    batch ``cms_estimate``.

    Output (streaming aggregate): (d, bucket, cnt).
    """
    tok = docs.select(
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "tok"
        )
    ).where(F.length("tok") > 0)
    rows = tok.select(
        F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1))).alias("d"),
        "tok",
    )
    expr = None
    for d in range(int(depth)):
        b = _bucket(F.col("tok"), d, width, seed)
        expr = F.when(F.col("d") == d, b) if expr is None else expr.when(
            F.col("d") == d, b
        )
    return (
        rows.select("d", expr.alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
