"""Runtime overflow guards on fixed-point LONG aggregates (r8 verdict
item 2): the 2^63 tick ceiling was documented but unguarded — at 6
digits a tick sum silently wraps past ~9.2e12 units, exactly the regime
a 100 TB aggregate lives in. ``canonical.guarded_long_sum`` (used by
``tick_sum``/``tick_avg``/``_psum``/``_pavg`` and DSIR's ``logw_fp``)
raises loudly when ``max|term| * count`` approaches 2^63 — a
layout-independent bound (ANSI mode only catches a wrap that actually
occurs in this run's partial-sum order; cancelling partials can hide
one)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solar_data_tools_spark.operators.canonical import (
    tick_avg,
    tick_sum,
)


def test_tick_sum_near_overflow_raises_loudly(spark):
    """Planted near-ceiling column -> loud guard error, not a wrapped
    hash. The pair cancels (+5e12, -5e12 at 1e6 ticks/unit -> +-5e18
    tick terms, ordered sum 0), so ANSI's per-add check never fires —
    only the guard can see the danger."""
    big = spark.createDataFrame(
        [(1, 5.0e12), (1, -5.0e12)], "g int, v double"
    )
    with pytest.raises(Exception, match="overflow guard"):
        big.groupBy("g").agg(tick_sum("v", 6).alias("s")).collect()


def test_tick_avg_near_overflow_raises_loudly(spark):
    # cancelling pair again: same-sign terms would trip ANSI's per-add
    # ARITHMETIC_OVERFLOW before the guard's projection runs; the
    # guard's value is exactly the cancelling case ANSI cannot see
    big = spark.createDataFrame(
        [(1, 6.0e12), (1, -6.0e12)], "g int, v double"
    )
    with pytest.raises(Exception, match="overflow guard"):
        big.groupBy("g").agg(tick_avg("v", 6).alias("a")).collect()


def test_tick_sum_normal_values_unaffected(spark):
    out = (
        spark.createDataFrame(
            [(1, 1.25), (1, 2.5), (2, 3.125), (2, None)],
            "g int, v double",
        )
        .groupBy("g")
        .agg(tick_sum("v").alias("s"), tick_avg("v").alias("a"))
        .orderBy("g")
        .collect()
    )
    assert [(r["s"], r["a"]) for r in out] == [(3.75, 1.875), (3.125, 3.125)]


def test_dsir_logw_fp_guard_fires_on_planted_extreme(spark):
    """The DSIR weighted-count sum carries the same guard: a planted
    feature table with ~2^62-scale cnt*lr_fp terms must error, not
    wrap."""
    from solar_data_tools_spark.operators.canonical import guarded_long_sum

    feats = spark.createDataFrame(
        [(1, 3_000_000_000, 3_000_000_000), (1, 2, 5)],
        "doc_id long, cnt long, lr long",
    )
    with pytest.raises(Exception, match="overflow guard"):
        feats.groupBy("doc_id").agg(
            guarded_long_sum(
                F.col("cnt") * F.col("lr"), what="dsir logw_fp"
            ).alias("s")
        ).collect()
