"""Mergeable sketches for corpus-scale statistics.

HyperLogLog++ cardinality rides Spark's built-in
``approx_count_distinct`` (q151); this module adds the count-min sketch
— the heavy-hitter / frequency-estimate companion. At 100 TB an exact
token-frequency table means shuffling |vocab| keys (billions for web
n-grams); a CMS reduces the aggregate to a fixed ``depth x width`` grid
with map-side combine, at the cost of a one-sided overestimate bounded
by ``e * total / width`` with probability ``1 - e^-depth``
(Cormode & Muthukrishnan 2005).

The bucket hash is md5-derived (the engine-portable convention of
``hash_uniform``), so sketch construction AND point queries are exactly
replayable in DuckDB — the q163 oracle certifies both ends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solar_data_tools_spark.operators.dedup import normalize_text


def _bucket(col, d: int, width: int, seed) -> F.Column:
    h = F.md5(F.concat(F.lit(f"{seed}:{d}:"), col.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width)
    )


def cms_build(
    docs: DataFrame,
    width: int = 1024,
    depth: int = 4,
    text_col: str = "text",
    seed: int | str = 0,
) -> DataFrame:
    """Build a count-min sketch over the corpus's tokens.

    One explode + one (d, bucket)-keyed aggregate; with map-side
    combine each task emits at most ``depth * width`` partial rows no
    matter how much text it scanned — the whole shuffle is a few KB per
    partition, like the HLL path. Output: (d, bucket, cnt), at most
    ``depth * width`` rows.
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


def cms_estimate(
    cms: DataFrame,
    tokens: DataFrame,
    width: int = 1024,
    depth: int = 4,
    token_col: str = "token",
    seed: int | str = 0,
) -> DataFrame:
    """Point-query a count-min sketch: estimate(token) = min over rows
    d of cms[d][h_d(token)] — a one-sided overestimate of the true
    frequency.

    The sketch is at most ``depth * width`` rows and broadcasts; the
    token probe set joins it ``depth`` times cheaper than any corpus
    re-scan. Missing buckets read as 0 (token never seen).
    Output: tokens' columns + ``cms_cnt``.
    """
    probes = tokens.select(
        F.col(token_col),
        F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1))).alias("d"),
    )
    expr = None
    for d in range(int(depth)):
        b = _bucket(F.col(token_col), d, width, seed)
        expr = F.when(F.col("d") == d, b) if expr is None else expr.when(
            F.col("d") == d, b
        )
    probes = probes.select(token_col, "d", expr.alias("bucket"))
    joined = probes.join(F.broadcast(cms), ["d", "bucket"], "left")
    return (
        joined.groupBy(token_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_cnt")
        )
    )
