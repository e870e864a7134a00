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
    df: DataFrame, keys: list[str], tasks_per_core: int = 4
) -> DataFrame:
    """Several task waves per core by default: group-to-task assignment is
    by key hash, so at one task per core the busiest task draws several
    times the mean solver load (observed 2.6x on a 150-site fleet at 8
    cores); 4 waves cut the straggler tail to ~1 group while Python worker
    reuse keeps the extra task overhead negligible.

    The explicit repartition alone is NOT enough: EnsureRequirements
    replaces it with its own exchange ahead of FlatMapGroupsInPandas, and
    AQE then coalesces that exchange by byte size — a fleet's daily table
    is a few hundred KB, so the whole solver stage lands in ONE task.
    ``minPartitionSize=1b`` makes AQE's parallelism-first rule binding
    (keep >= defaultParallelism partitions regardless of byte size), which
    is exactly the right trade for CPU-bound grouped-map stages and costs
    relational stages nothing but a few extra tiny tasks. Set here (not
    only in get_spark) so externally created sessions — the bench driver's
    vanilla session included — get parallel solver stages too.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
    sc = spark.sparkContext
    n = max(sc.defaultParallelism * tasks_per_core, 1)
    return df.repartition(n, *keys)
