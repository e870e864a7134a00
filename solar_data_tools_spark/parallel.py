"""Parallelism control for solver-layer grouped-map stages.

AQE coalesces shuffle partitions by BYTE size — the right cost model for
relational stages, the wrong one for ``applyInPandas`` stages where each
row group carries a CPU-heavy solve (a fleet's daily table is ~1 MB but
thousands of solver-seconds). Left alone, AQE folds the whole fleet into
one task and serializes the solver layer.

``partition_for_grouped_map`` repartitions by the group key with explicit
parallelism BEFORE the groupBy: the grouped-map's required distribution
(clustered by key) is already satisfied, so Spark reuses the partitioning
instead of inserting a fresh (coalescible) exchange — every executor core
gets solver work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def partition_for_grouped_map(
    df: DataFrame, keys: list[str], tasks_per_core: int = 1
) -> DataFrame:
    """One task wave by default: grouped-map tasks here are near-uniform
    (per-site series of similar length), so extra waves only add Python
    worker startup; raise ``tasks_per_core`` when group sizes are skewed."""
    sc = df.sparkSession.sparkContext
    n = max(sc.defaultParallelism * tasks_per_core, 1)
    return df.repartition(n, *keys)
