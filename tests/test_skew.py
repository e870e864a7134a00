"""Skew tooling (operators/skew.py): salted two-phase aggregation must be
bit-equal to the direct groupBy for every supported aggregate, immune to
the bucket count, loudly overflow-guarded, and its plan must actually
spread phase 1 over (keys, salt); the skew report's arithmetic and
tie-breaks are pinned against hand computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solar_data_tools_spark.operators.skew import key_skew_report, salted_agg


def _skewed_df(spark, n=5000):
    # key 'hot' holds ~80% of rows; values exercise negatives + floats
    return (
        spark.range(n)
        .select(
            F.when(F.col("id") % 5 < 4, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
            .alias("k"),
            (F.col("id") % 13).cast("long").alias("iv"),
            ((F.col("id") % 997) / 7.0 - 50.0).alias("dv"),
        )
        .repartition(8)
    )


def _direct(df):
    return df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("iv").alias("iv_sum"),
        (
            F.sum(F.floor(F.col("dv") * 1e4 + F.lit(0.5)).cast("long"))
            / 1e4
        ).alias("dv_sum"),
        F.min("dv").alias("dv_min"),
        F.max("dv").alias("dv_max"),
    )


def _salted(df, buckets):
    return salted_agg(
        df,
        "k",
        long_sums={"iv_sum": "iv"},
        tick_sums={"dv_sum": ("dv", 4)},
        mins={"dv_min": "dv"},
        maxs={"dv_max": "dv"},
        count_alias="n",
        salt_buckets=buckets,
    )


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_agg_bit_equal_to_direct_groupby(spark):
    df = _skewed_df(spark)
    assert _rows(_salted(df, 16)) == _rows(_direct(df))


def test_salted_agg_invariant_to_bucket_count(spark):
    df = _skewed_df(spark)
    one = _rows(_salted(df, 1))
    many = _rows(_salted(df, 64))
    assert one == many == _rows(_direct(df))


def test_salted_agg_overflow_guard_fires(spark):
    # ticks ~ 9e14 each at digits=4 -> max|tick| * count > 9e18 at 1e4 rows
    df = spark.range(10_000).select(
        F.lit("k").alias("k"), F.lit(9.0e10).alias("dv")
    )
    out = salted_agg(
        df, "k", tick_sums={"s": ("dv", 4)}, salt_buckets=8
    )
    with pytest.raises(Exception, match="overflow guard"):
        out.collect()


def test_salted_agg_plan_two_phase(spark):
    """Phase 1 must exchange on (keys, salt) — the skew-leveling step —
    and phase 2 on the bare keys; everything stays JVM-side."""
    df = _skewed_df(spark)
    plan = (
        _salted(df, 16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("hashpartitioning") >= 2
    assert "_salt" in plan  # the phase-1 grouping key
    assert "EvalPython" not in plan


def test_key_skew_report_math_and_tiebreak(spark):
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 2
    df = spark.createDataFrame(rows, ["k"]).repartition(4)
    got = {
        r["k"]: r
        for r in key_skew_report(df, "k", top_n=3).collect()
    }
    assert set(got) == {"a", "b", "c"}  # d trimmed; b before c on tie
    assert got["a"]["rank"] == 1 and got["a"]["cnt"] == 6
    assert got["b"]["rank"] == 2 and got["c"]["rank"] == 3
    assert got["a"]["total_rows"] == 14 and got["a"]["n_keys"] == 4
    # share = 6/14 rounded half-up at 6 digits; skew = share * 4 keys
    assert got["a"]["share"] == pytest.approx(0.428571, abs=1e-9)
    assert got["a"]["skew_factor"] == pytest.approx(1.714286, abs=1e-9)


def test_key_skew_report_no_global_sort(spark, sf_small):
    """The top-N pick must be a TakeOrdered, not a full sort shuffle,
    and the stats side must broadcast."""
    from solar_data_tools_spark.session import read_table

    ev = read_table(spark, f"{sf_small}/events.parquet")
    plan = (
        key_skew_report(ev, "user_id", top_n=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_join_skew_report_pair_volume_and_absent_keys(spark):
    """Co-hot keys rank first; keys absent from one side report 0
    pairs; ties break on the key ascending."""
    from solar_data_tools_spark.operators.skew import join_skew_report

    left = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 2 + [("c",)] * 1, ["k"]
    )
    right = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 6 + [("d",)] * 5, ["k"]
    )
    rows = {r["k"]: r for r in join_skew_report(left, right, "k").collect()}
    assert rows["a"]["pair_volume"] == 12.0 and rows["a"]["rank"] == 1
    assert rows["b"]["pair_volume"] == 12.0 and rows["b"]["rank"] == 2
    assert rows["c"]["cnt_r"] == 0 and rows["c"]["pair_volume"] == 0.0
    assert rows["d"]["cnt_l"] == 0 and rows["d"]["pair_volume"] == 0.0


# ---------------------------------------------------------------------------
# Round 10: wide (DECIMAL(38,0)) escalation + input validation (r9
# verdict item 1 + ADVICE items).
# ---------------------------------------------------------------------------


def test_salted_agg_wide_matches_narrow_below_ceiling(spark):
    """wide=True is a drop-in: below the LONG ceiling the decimal path
    must reproduce the narrow results exactly (long sums compare as
    ints; tick sums are the identical double display value)."""
    df = _skewed_df(spark)
    narrow = {r["k"]: r for r in _salted(df, 8).collect()}
    wide = {
        r["k"]: r
        for r in salted_agg(
            df,
            "k",
            long_sums={"iv_sum": "iv"},
            tick_sums={"dv_sum": ("dv", 4)},
            mins={"dv_min": "dv"},
            maxs={"dv_max": "dv"},
            count_alias="n",
            salt_buckets=8,
            wide=True,
        ).collect()
    }
    assert narrow.keys() == wide.keys()
    for k, a in narrow.items():
        b = wide[k]
        assert int(b["iv_sum"]) == a["iv_sum"]
        assert b["dv_sum"] == a["dv_sum"]
        assert (b["n"], b["dv_min"], b["dv_max"]) == (
            a["n"], a["dv_min"], a["dv_max"],
        )


def test_salted_agg_wide_completes_past_long_ceiling(spark):
    """Planted hot key whose true long-sum is ~1.2e19 (> 2^63): narrow
    salted_agg must refuse loudly, wide must complete with the exact
    decimal."""
    df = spark.range(4).select(
        F.lit("hot").alias("k"),
        F.lit(3_000_000_000_000_000_000).alias("big"),
    )
    with pytest.raises(Exception, match="overflow"):
        salted_agg(df, "k", long_sums={"s": "big"}, salt_buckets=4).collect()
    rows = salted_agg(
        df, "k", long_sums={"s": "big"}, salt_buckets=4, wide=True
    ).collect()
    assert str(rows[0]["s"]) == "12000000000000000000"
    assert rows[0]["n"] == 4


def test_salted_agg_rejects_duplicate_output_names(spark):
    df = _skewed_df(spark, 100)
    with pytest.raises(ValueError, match="duplicate output names"):
        salted_agg(
            df, "k",
            long_sums={"x": "iv"},
            tick_sums={"x": ("dv", 4)},
        )
    with pytest.raises(ValueError, match="duplicate output names"):
        salted_agg(df, "k", long_sums={"n": "iv"}, count_alias="n")


def test_salted_agg_rejects_reserved_input_columns(spark):
    df = _skewed_df(spark, 100).withColumn("_salt", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        salted_agg(df, "k", long_sums={"s": "iv"})
    df2 = _skewed_df(spark, 100).withColumn("_p_x", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        salted_agg(df2, "k", long_sums={"s": "iv"})


def test_capped_join_bounds_both_sides_hot_key(spark):
    """Planted co-skewed pair: key 'hot' has 4000 rows on EACH side
    (16,000,000 true pairs — the quadratic class q177 diagnoses); a
    normal key has 5 x 3. capped_join emits exactly cap_l*cap_r pairs
    for the hot key, the untouched cross product for the normal key,
    and the report ledger accounts for every dropped row."""
    from solar_data_tools_spark.operators.skew import capped_join

    def side(n_hot, n_norm, col):
        hot = spark.range(n_hot).select(
            F.lit("hot").alias("k"), F.col("id").alias(col)
        )
        norm = spark.range(n_norm).select(
            F.lit("norm").alias("k"), (F.col("id") + 10_000).alias(col)
        )
        return hot.unionAll(norm).repartition(8)

    joined, report = capped_join(
        side(4000, 5, "l_id"),
        side(4000, 3, "r_id"),
        "k",
        cap_left=20,
        cap_right=10,
        order_left=["l_id"],
        order_right=["r_id"],
    )
    pairs = {r["k"]: r["cnt"] for r in
             joined.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert pairs == {"hot": 200, "norm": 15}
    rep = {r["k"]: r for r in report.collect()}
    assert rep["hot"]["dropped_l"] == 3980 and rep["hot"]["dropped_r"] == 3990
    assert rep["hot"]["emitted_pairs"] == 200.0
    assert rep["hot"]["true_pairs"] == 16_000_000.0
    assert rep["norm"]["dropped_l"] == 0 and rep["norm"]["dropped_r"] == 0
    assert rep["norm"]["emitted_pairs"] == 15.0 == rep["norm"]["true_pairs"]
    # the kept rows are the DETERMINISTIC top-k by the order column:
    # two-phase truncation == one global window
    kept = sorted(
        r["l_id"] for r in joined.where(F.col("k") == "hot")
        .select("l_id").distinct().collect()
    )
    assert kept == list(range(20))


def test_capped_join_report_covers_one_sided_keys(spark):
    """Keys absent from one side appear in the report with zero
    emitted/true pairs (inner join emits nothing) — the no-overlap
    signal, same contract as join_skew_report."""
    from solar_data_tools_spark.operators.skew import capped_join

    left = spark.createDataFrame([("a", 1), ("b", 2)], "k string, l_id long")
    right = spark.createDataFrame([("a", 9)], "k string, r_id long")
    joined, report = capped_join(
        left, right, "k", cap_left=5, cap_right=5,
        order_left=["l_id"], order_right=["r_id"],
    )
    assert joined.count() == 1
    rep = {r["k"]: r for r in report.collect()}
    assert rep["b"]["cnt_r"] == 0 and rep["b"]["true_pairs"] == 0.0
    assert rep["b"]["emitted_pairs"] == 0.0


def test_capped_join_truncation_plan_two_phase(spark):
    """Plan audit: the per-key truncation must be the two-phase top-k —
    a Window partitioned on (key, salt) feeding a Window on (key) —
    never a single global-sort or a one-shot hot-key window."""
    from solar_data_tools_spark.operators.skew import capped_join

    left = spark.createDataFrame([("a", 1)], "k string, l_id long")
    right = spark.createDataFrame([("a", 2)], "k string, r_id long")
    joined, _ = capped_join(
        left, right, "k", cap_left=5, cap_right=5,
        order_left=["l_id"], order_right=["r_id"],
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # phase A spreads each key over _cap_salt buckets...
    assert "_cap_salt" in plan, plan
    # ...and there is no global Sort outside window-local sorts: every
    # Sort node in the plan is the non-global per-partition kind
    for ln in plan.splitlines():
        if "+- Sort [" in ln or ln.strip().startswith("Sort ["):
            assert "false, 0" in ln, f"global sort in capped_join: {ln}"


def test_salted_agg_rejects_output_colliding_with_key(spark):
    df = _skewed_df(spark, 100)
    with pytest.raises(ValueError, match="collide with key columns"):
        salted_agg(df, "k", long_sums={"k": "iv"}, count_alias="n")
    with pytest.raises(ValueError, match="collide with key columns"):
        salted_agg(df, "k", long_sums={"s": "iv"}, count_alias="k")


def test_capped_join_rejects_reserved_and_shared_columns(spark):
    from solar_data_tools_spark.operators.skew import capped_join

    left = spark.createDataFrame([("a", 1)], "k string, l_id long")
    right = spark.createDataFrame([("a", 2)], "k string, r_id long")
    bad = left.withColumn("_cap_rn", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        capped_join(bad, right, "k", cap_left=5, cap_right=5,
                    order_left=["l_id"], order_right=["r_id"])
    shared_l = left.withColumn("v", F.lit(1))
    shared_r = right.withColumn("v", F.lit(2))
    with pytest.raises(ValueError, match="BOTH sides"):
        capped_join(shared_l, shared_r, "k", cap_left=5, cap_right=5,
                    order_left=["l_id"], order_right=["r_id"])


def test_capped_join_order_tie_audit(spark):
    """ADVICE r10: report_order_ties surfaces unique-order-tuple
    contract violations in the report instead of trusting the
    docstring — a duplicated order tuple on a key shows up as
    order_ties > 0 on exactly that key/side, and a clean input
    reports all zeros."""
    from pyspark.sql import functions as F

    from solar_data_tools_spark.operators.skew import capped_join

    left = spark.createDataFrame(
        [("k1", 1), ("k1", 1), ("k1", 2), ("k2", 5)],  # tie on k1
        "k string, oid int",
    ).select("k", F.col("oid").alias("l_oid"))
    right = spark.createDataFrame(
        [("k1", 10), ("k1", 11), ("k2", 20)], "k string, r_oid int"
    )
    _, report = capped_join(
        left,
        right,
        "k",
        cap_left=2,
        cap_right=2,
        order_left=["l_oid"],
        order_right=["r_oid"],
        report_order_ties=True,
    )
    rows = {r["k"]: r for r in report.collect()}
    assert rows["k1"]["order_ties_l"] == 1 and rows["k1"]["order_ties_r"] == 0
    assert rows["k2"]["order_ties_l"] == 0 and rows["k2"]["order_ties_r"] == 0
    # default report keeps the count-tables-only shape (no tie columns)
    _, plain = capped_join(
        left.where(F.col("l_oid") != 1),
        right,
        "k",
        cap_left=2,
        cap_right=2,
        order_left=["l_oid"],
        order_right=["r_oid"],
    )
    assert "order_ties_l" not in plain.columns
