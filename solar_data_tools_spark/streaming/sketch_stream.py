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


def streaming_hll(
    docs: DataFrame,
    n: int = 3,
    p: int = 12,
    text_col: str = "text",
    group_cols: list[str] | None = None,
    seed: int | str = 0,
) -> DataFrame:
    """Maintain HyperLogLog registers over a document STREAM: same md5
    bits, same (bucket, rho) ranks as the batch ``hll_build`` — one
    stateful MAX aggregation whose state never exceeds
    ``|groups| * 2^p`` rows, watermark-free for the same reason as
    ``streaming_cms`` (a fixed key space + a monotone aggregate; MAX is
    as stream-legal as SUM). The registers at any point equal
    ``hll_build`` over everything ingested so far (streaming==batch
    contract test), and feed the batch ``hll_estimate`` unchanged —
    live "distinct shingles so far" without ever holding the shingle
    set.

    Output (streaming aggregate): (*group_cols, bucket, rho).
    """
    from solar_data_tools_spark.operators.sketches import hll_build

    g = list(group_cols or [])
    tokens = F.split(normalize_text(F.col(text_col)), " ")
    grams = F.expr(
        f"transform(sequence(1, greatest(size(_toks) - {n - 1}, 0)), "
        f"i -> concat_ws(' ', slice(_toks, i, {n})))"
    )
    sh = (
        docs.select(*g, tokens.alias("_toks"))
        .where(F.size("_toks") >= n)
        .select(*g, F.explode(grams).alias("shingle"))
    )
    # hll_build is groupBy(bucket).max(rho) — already stream-legal; no
    # array_distinct needed (duplicates cannot change a MAX)
    return hll_build(sh, token_col="shingle", group_cols=g, p=p, seed=seed)


def streaming_bloom(
    docs: DataFrame,
    n: int = 8,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    text_col: str = "text",
    seed: int | str = 0,
) -> DataFrame:
    """Maintain a Bloom filter over a document STREAM — the live
    decontamination screen: as eval/benchmark docs arrive, their
    n-gram bits OR into a fixed ``ceil(num_bits/63)``-word state, and
    the materialized words feed the batch ``bloom_probe`` unchanged.
    ``bit_or`` over a fixed key space is monotone and watermark-free
    for the same reason as the CMS grid and HLL registers; state never
    exceeds the word count however much text flows through. The words
    at any point equal ``bloom_build`` over everything ingested
    (streaming==batch contract test).

    Output (streaming aggregate): (word, bits).
    """
    from solar_data_tools_spark.operators.sketches import bloom_build

    tokens = F.split(normalize_text(F.col(text_col)), " ")
    grams = F.expr(
        f"transform(sequence(1, greatest(size(_toks) - {n - 1}, 0)), "
        f"i -> concat_ws(' ', slice(_toks, i, {n})))"
    )
    sh = (
        docs.select(tokens.alias("_toks"))
        .where(F.size("_toks") >= n)
        .select(F.explode(grams).alias("shingle"))
    )
    return bloom_build(
        sh,
        token_col="shingle",
        num_bits=num_bits,
        num_hashes=num_hashes,
        seed=seed,
    )
