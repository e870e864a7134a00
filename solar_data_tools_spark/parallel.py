"""Parallelism control for solver-layer grouped-map stages.

AQE coalesces shuffle partitions by BYTE size — the right cost model for
relational stages, the wrong one for grouped-map stages where each row
group carries a CPU-heavy solve (a fleet's daily table is ~1 MB but
thousands of solver-seconds). Left alone, AQE folds the whole fleet into
one task and serializes the solver layer.

``grouped_apply`` is the solver layer's grouped-map primitive. It is
``groupBy(keys).applyInPandas(fn)`` re-expressed as an explicit
``repartition(n, keys)`` followed by ``mapInPandas`` with an in-task
pandas groupby, which fixes two things the naive form gets wrong:

1. **Parallelism is plan-owned, not config-owned.** A user repartition
   with an explicit partition count is a ``REPARTITION_BY_NUM`` shuffle,
   which AQE's partition coalescing never touches — on ANY session,
   including externally created vanilla ones, with NO session-config
   override (``applyInPandas`` would instead insert its own coalescible
   exchange via EnsureRequirements, which once forced a global
   ``minPartitionSize`` override; that config side effect is gone now
   that every solver stage routes through ``grouped_apply`` — asserted
   by ``test_plan_audits.py::test_grouped_apply_survives_aqe``).
2. **One Python worker round-trip per PARTITION, not per group.** Arrow
   transfer + per-task setup is ~10 ms; at one task per tiny group a
   100k-site fleet pays 100k round-trips. Groups in a partition run
   sequentially inside one task, which also lets callers batch across
   groups (see ``solve_tl1_l2d2p365_batch``).

Memory bound per task = the partition's row slice (all groups hash-spread
over ``n`` partitions), the same bound ``applyInPandas`` already imposed
per group times groups-per-task — daily/solver tables are a few MB per
1000 sites, far under executor memory.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def partition_for_grouped_map(
    df: DataFrame, keys: list[str], tasks_per_core: int = 4
) -> DataFrame:
    """Repartition by the group key with explicit parallelism BEFORE a
    grouped-map stage (several task waves per core by default: group-to-
    task assignment is by key hash, so at one task per core the busiest
    task draws several times the mean solver load; observed 2.6x on a
    150-site fleet at 8 cores).

    NOTE: for ``groupBy().applyInPandas`` consumers this alone is not
    sufficient: EnsureRequirements replaces the explicit repartition
    with its own coalescible exchange, which AQE may fold into one task
    unless ``minPartitionSize`` is globally overridden. Prefer
    :func:`grouped_apply`, whose ``repartition(n, keys) -> mapInPandas``
    shape keeps the REPARTITION_BY_NUM hint and needs no session config.
    """
    spark = df.sparkSession
    sc = spark.sparkContext
    n = max(sc.defaultParallelism * tasks_per_core, 1)
    return df.repartition(n, *keys)


# Per-group pandas budget for grouped-map kernels. The fleet probe
# MEASURES the real quantity (26.5 MB for a 3-year 5-min site, 9.7 MB
# for 400 days — tools/fleet_probe.py asserts it); the guard exists for
# the pathological tail a 100 TB fleet will contain (a 1-second-cadence
# site, a corrupt ingest that lands one site 1000x its share): without
# it, ONE such group OOMs an executor and kills the whole fleet job.
# With it, the site fails loudly (grouped_apply) or becomes a per-site
# error annotation (wrap_capture_errors), matching the fleet-runner
# isolation contract. The check is one pandas memory_usage(deep=True)
# call per group — O(columns) on the numeric frames the solver tier
# feeds (deep string scans only arise on curation-tier frames, which
# do not route through these wrappers).
#
# Scope (honest, per the r9 ADVICE): the check runs AFTER the
# partition's Arrow batches are concatenated, so it bounds the
# KERNEL/SOLVER allocation the group triggers (matrices, solver state,
# per-group numpy stacks — the multi-x amplification that actually
# OOMs workers), NOT the raw pandas residency of the partition itself.
# A corrupt ingest so large that merely HOLDING the rows in the Python
# worker fails would still OOM before the guard fires; the structural
# mitigation for that layer is the cores*4 hash spread of
# ``repartition(n, *keys)`` (one partition holds ~1/n of the keys) plus
# executor memory sized for ``spark.sql.execution.arrow.
# maxRecordsPerBatch``-scale buffering. A pre-concat check cannot be
# made per-GROUP without per-key streaming (a batch legitimately mixes
# many small groups, and one group legitimately spans many batches).
DEFAULT_GROUP_BUDGET_BYTES = 512 * 1024 * 1024


def _check_group_budget(
    pdf: pd.DataFrame, budget: int | None, what: str
) -> None:
    if budget is None:
        return
    b = int(pdf.memory_usage(deep=True).sum())
    if b > budget:
        raise MemoryError(
            f"{what}: group holds {b / 2**20:.0f} MiB > "
            f"{budget / 2**20:.0f} MiB per-executor group budget "
            "(raise group_budget_bytes or reduce the group's "
            "cadence/span)"
        )


def grouped_apply(
    df: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    tasks_per_core: int = 4,
    group_budget_bytes: int | None = None,
) -> DataFrame:
    """``groupBy(keys).applyInPandas(fn, schema)`` with plan-owned
    parallelism and per-partition Python round-trips (see module
    docstring). ``fn`` receives each group as a pandas DataFrame exactly
    as ``applyInPandas`` would (key columns included, index reset).

    Ships the package to executors BEFORE creating the mapInPandas
    closure: a UDF's python-includes list is captured into its
    PythonFunction at creation time, so an ``addPyFile`` issued after
    building the closure never reaches the tasks that run it.
    """
    from solar_data_tools_spark.shipping import ensure_package_on_executors

    spark = df.sparkSession
    ensure_package_on_executors(spark)
    n = max(spark.sparkContext.defaultParallelism * tasks_per_core, 1)
    prepared = df.repartition(n, *keys)
    key_list = list(keys)

    def _run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [b for b in batches]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        if pdf.empty:
            return
        for _, g in pdf.groupby(key_list, sort=False, dropna=False):
            _check_group_budget(g, group_budget_bytes, "grouped_apply")
            out = fn(g.reset_index(drop=True))
            if out is not None and len(out):
                yield out

    return prepared.mapInPandas(_run, schema)


def wrap_capture_errors(
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    site_col: str,
    group_budget_bytes: int | None = DEFAULT_GROUP_BUDGET_BYTES,
) -> tuple[Callable[[pd.DataFrame], pd.DataFrame], str]:
    """Per-site failure isolation for grouped-map stages (the fleet-runner
    contract, reference sdt_dask/dask_tool/runner.py:53-146): wrap a
    grouped-apply kernel so one site's exception becomes a 1-row result
    carrying the message in an ``error`` column ("No error" otherwise)
    instead of killing the whole fleet job.

    ``group_budget_bytes`` (round 9, default 512 MiB — the fleet
    probe's measured 3-year site is 26.5 MB, 19x headroom): a site
    whose pandas group exceeds the budget becomes an error row BEFORE
    the kernel allocates solver state on it — one pathological site
    (1-second cadence, corrupt fan-in) annotates instead of OOMing the
    executor and killing the fleet job. Pass ``None`` to disable.

    Returns (wrapped_fn, schema + ", error string").
    """
    # Split on TOP-LEVEL commas only: a naive comma-split would silently
    # mis-derive names from parameterized types (decimal(10,2),
    # struct<a:int,b:string>) and emit a malformed error row.
    # (pyspark's _parse_datatype_string needs an active session, which
    # this helper must not assume — it's called while building plans.)
    parts, depth, cur = [], 0, []
    for ch in schema:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    col_names = []
    for part in parts:
        toks = part.strip().split(None, 1)
        if len(toks) != 2:
            raise ValueError(
                f"wrap_capture_errors: cannot derive a column name from "
                f"schema fragment {part.strip()!r} in {schema!r}"
            )
        col_names.append(toks[0])
    if site_col not in col_names:
        raise ValueError(
            f"wrap_capture_errors: site_col {site_col!r} not in schema "
            f"{schema!r} (parsed columns: {col_names})"
        )

    def _wrapped(pdf: pd.DataFrame) -> pd.DataFrame:
        try:
            _check_group_budget(
                pdf, group_budget_bytes, "per-site group"
            )
            out = fn(pdf)
            out = out.copy()
            out["error"] = "No error"
            return out
        except Exception as e:  # noqa: BLE001 — the isolation contract
            row: dict = {c: [None] for c in col_names}
            row[site_col] = [pdf[site_col].iloc[0] if len(pdf) else None]
            row["error"] = [f"{type(e).__name__}: {e}"]
            return pd.DataFrame(row)

    return _wrapped, schema + ", error string"
