"""PageRank unit tests: hand-computed goldens (incl. dangling-mass
redistribution), mass conservation, determinism. The recursive-CTE
DuckDB oracle lives in test_oracle_parity.py (q148)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from solar_data_tools_spark.operators.graph import pagerank


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_two_node_cycle_is_uniform(spark):
    e = spark.createDataFrame(
        [Row(src=0, dst=1), Row(src=1, dst=0)]
    )
    got = _ranks(pagerank(e, n_iters=7))
    assert got == {0: pytest.approx(1.0), 1: pytest.approx(1.0)}


def test_single_edge_with_dangling_golden(spark):
    """A -> B, B dangling. One iteration by hand (scaled ranks, N=2):
    dangling mass = rank_B = 1;
    rank_A = 0.15 + 0.85 * (0 + 1/2)      = 0.575
    rank_B = 0.15 + 0.85 * (1 + 1/2)      = 1.425  (sum stays 2)."""
    e = spark.createDataFrame([Row(src=0, dst=1)])
    got = _ranks(pagerank(e, n_iters=1))
    assert got[0] == pytest.approx(0.575)
    assert got[1] == pytest.approx(1.425)


def test_mass_conserved_with_dangling(spark):
    """Dangling redistribution keeps total rank == N at every depth."""
    pairs = [(i, (i * 3 + 1) % 7) for i in range(5)]
    e = spark.createDataFrame([Row(src=s, dst=d) for s, d in pairs])
    n = len({x for p in pairs for x in p})  # 6 distinct endpoints
    for it in (1, 3, 6):
        total = (
            pagerank(e, n_iters=it).agg(F.sum("rank")).collect()[0][0]
        )
        assert total == pytest.approx(n, rel=1e-9)


def test_sink_outranks_source(spark):
    e = spark.createDataFrame(
        [Row(src=i, dst=i + 1) for i in range(6)]
    )
    got = _ranks(pagerank(e, n_iters=10))
    assert got[6] > got[3] > got[0]


def test_partitioning_invariant_with_ordered_sum(spark):
    e = spark.createDataFrame(
        [Row(src=i % 11, dst=(i * 5 + 2) % 11) for i in range(30)]
    )
    a = _ranks(pagerank(e, n_iters=5, ordered_sum=True))
    b = _ranks(pagerank(e.repartition(7), n_iters=5, ordered_sum=True))
    assert a == b  # bit-exact, not approx
    # and the fold agrees with the parallel sum to fp tolerance
    c = _ranks(pagerank(e, n_iters=5))
    assert all(abs(a[k] - c[k]) < 1e-9 for k in a)


def test_damping_validation(spark):
    e = spark.createDataFrame([Row(src=0, dst=1)])
    with pytest.raises(ValueError):
        pagerank(e, damping=1.0)


def test_fixed_point_trajectory_partitioning_invariant(spark):
    """The all-LONG trajectory (q148's certified path) is bit-exact
    across partitionings BY CONSTRUCTION (integer sums commute) — no
    sorted fold needed — and tracks the float path to quantization
    tolerance (< in_degree ticks/iter at 1e9 ticks/unit)."""
    e = spark.createDataFrame(
        [Row(src=i % 11, dst=(i * 5 + 2) % 11) for i in range(30)]
    )
    fa = {
        r["node"]: r["rank_fp"]
        for r in pagerank(e, n_iters=5, fixed_point=True).collect()
    }
    fb = {
        r["node"]: r["rank_fp"]
        for r in pagerank(
            e.repartition(7), n_iters=5, fixed_point=True
        ).collect()
    }
    assert fa == fb  # exact integers
    c = _ranks(pagerank(e, n_iters=5))
    assert all(abs(fa[k] / 1e9 - c[k]) < 1e-6 for k in fa)


def test_fixed_point_overflow_guard(spark):
    e = spark.createDataFrame([Row(src=0, dst=1), Row(src=1, dst=0)])
    with pytest.raises(ValueError, match="overflow"):
        pagerank(e, fixed_point=True, scale=10**18)
