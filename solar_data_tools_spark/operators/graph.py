"""Link-graph operators for crawl curation.

Web-crawl pipelines rank hosts/pages by link-graph centrality before
spending fetch or compute budget on them (Common Crawl publishes
host-level harmonic centrality + PageRank for exactly this; OPIC-style
frontier prioritization in production crawlers). PageRank here is the
classic damped power iteration (Page et al. 1999) expressed as a fixed
number of join+aggregate rounds:

    rank_{t+1}(v) = (1 - d)/N + d * sum_{(u,v) in E} rank_t(u) / deg(u)

Scale shape: each iteration is ONE shuffle of (dst, contribution)
pairs with map-side partial sums — cost O(|E|) per round regardless of
rank skew — plus a broadcast-joinable degree table; the rank frame is
``localCheckpoint``-ed per round (the connected-components pattern) so
the plan does not grow with iteration count. Dangling mass (nodes with
no out-edges) is redistributed uniformly, the standard correction.

Cross-engine reproducibility: partition-parallel double sums differ
from sequential sums in the last ulps, and over many iterations that
drift compounds. ``ordered_sum=True`` makes every iterate BIT-identical
on any engine and any partitioning: each node's inbound contributions
are collected, sorted by source id, and folded left-to-right — the same
sequence of IEEE adds everywhere. (Per-iterate fixed-point rounding was
tried first and is a trap: rounded inputs make the next iterate land
EXACTLY on half-ticks of the grid, where a 1-ulp upstream difference
flips the rounding — 9/500 rows flickered at sf0.001.) The cost is a
per-node in-memory contribution list, fine for bounded in-degree;
leave it off for mega-in-degree graphs and compare rank ORDER instead.
This is what lets a DuckDB recursive-CTE oracle certify the operator
trajectory exactly (q148).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    ordered_sum: bool = False,
    fixed_point: bool = False,
    scale: int = 10**9,
    checkpoint: bool | str = True,
) -> DataFrame:
    """Damped PageRank over a directed edge list; returns
    ``(node, rank)`` with ranks scaled so they average 1.0 (rank =
    N * probability — scale-free across corpus sizes, and the scale
    where fixed-point quantization keeps 6 meaningful digits).

    Nodes are the union of both endpoint columns; duplicate edges are
    collapsed (simple-graph semantics, so both engines agree on degree).

    ``fixed_point=True`` runs the ENTIRE trajectory in LONG arithmetic
    at ``scale`` ticks per unit rank (the round-8 determinism contract,
    and what q148 certifies): contributions are truncating divisions
    ``rank_fp div deg``, inbound mass is an INTEGER sum — order-free,
    so no sorted fold is needed — and the damped update uses the
    rational ``round(damping * 1e4) / 1e4``. Bit-identical across
    engines, partitionings, and scales by construction. (The
    ``ordered_sum`` float fold made both engines execute the same IEEE
    add SEQUENCE, but the sf0.1 sweep still caught 4/5000 one-tick
    flips after six rounds green at sf0.01 — per-element division
    results can differ in the last ulp once any upstream iterate
    drifts, and rounding amplifies a ulp into a tick. Integers close
    the class.) Quantization error per node per iteration is
    < in_degree ticks (1e-9 at the default scale) — invisible at the
    1e-6 certification grid after 5 iterations. Adds a ``rank_fp``
    LONG column beside the derived ``rank`` double.

    Overflow guard: worst-case inbound mass is the whole graph's
    ``n_nodes * scale`` ticks, multiplied by the 1e4 damping
    denominator — the call raises if that cannot fit a LONG, with the
    remedy (lower ``scale``) in the message. At the default 1e9 scale
    that bounds certified graphs to ~460k nodes; billion-node crawl
    graphs run at scale 1e5-1e6 (resolution 1e-5..1e-6 rank units),
    or with ``fixed_point=False`` where cross-engine equality is not
    needed.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    # checkpoint modes — False/"none" keeps the full per-iteration
    # lineage visible (the plan-audit hook,
    # test_plan_audits.py::test_q148_...; real multi-round runs need a
    # checkpoint or the plan tree grows exponentially with n_iters);
    # True/"local" localCheckpoints every SECOND iterate plus the last
    # (r13: each checkpoint costs a synchronous driver compile and the
    # truncation is value-free, so sparser is cheaper; the cost is a
    # 2-iteration recompute span — and in local mode an executor loss
    # is unrecoverable regardless: Spark cannot recompute past a
    # localCheckpoint, so the JOB fails and must retry); "reliable"
    # checkpoints on the same every-second-iterate cadence into the
    # session's checkpoint directory (spark.sparkContext
    # .setCheckpointDir — a DFS path on a cluster), the mode for
    # billion-edge multi-hour runs on preemptible nodes (r11 verdict
    # item 3): executor loss replays at most the 2 iterations since
    # the last DFS checkpoint. Failure semantics only — ranks are
    # identical in all three modes.
    mode = {False: "none", True: "local"}.get(checkpoint, checkpoint)
    if mode not in ("none", "local", "reliable"):
        raise ValueError(
            f"unknown checkpoint mode {checkpoint!r} "
            "(expected bool | 'none' | 'local' | 'reliable')"
        )

    def _ckpt(df: DataFrame) -> DataFrame:
        # per-iterate materialization: the rank table is small (one row
        # per node), so local mode keeps the default storage level
        # rather than materialize_df's DISK_ONLY grid policy
        if mode == "local":
            return df.localCheckpoint(eager=False)
        if mode == "reliable":
            from solar_data_tools_spark.session import materialize_df

            return materialize_df(df, "reliable")
        return df

    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d")
    ).distinct()
    # static tables are materialized ONCE (round 13, guide §2.4): the
    # edge distinct() — a full shuffle of the edge list — used to hide
    # behind each round's checkpoint boundary and re-execute per
    # iteration (and once more for the node/degree derivation). Like
    # the node table below, this is static input, not iteration
    # lineage, so the plan-audit hook still sees the per-round shape.
    e = (
        e.localCheckpoint(eager=False) if mode != "reliable" else _ckpt(e)
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    # the node table is consumed every iteration: even in "none" mode it
    # is locally checkpointed (the audit hook inspects the ITERATION
    # lineage, not this static input) — in reliable mode it goes to the
    # DFS with everything else
    nodes = (
        nodes.localCheckpoint(eager=False)
        if mode != "reliable"
        else _ckpt(nodes)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    if fixed_point:
        return _pagerank_fp(
            e, nodes, deg, n_nodes, n_iters, damping, int(scale),
            ckpt=_ckpt,
        )
    # carry the static out-degree ON the rank frame (round 13): the
    # previous loop re-joined ranks with the degree table every
    # iteration twice (dangling detection + per-edge contribution),
    # re-running the degree aggregate each round. One left join here
    # replaces all of them; the carried LONG column rides each round's
    # checkpoint. NULL _deg = dangling node, exactly the old join-miss.
    ranks = nodes.join(
        deg, nodes["node"] == deg["_s"], "left"
    ).select("node", "_deg", F.lit(1.0).alias("rank"))
    # dangling-ness is STATIC (degree never changes): one limit-1 probe
    # here decides whether the per-iteration dangling-mass scalar (an
    # aggregate job + broadcast per round) exists at all. For a graph
    # with no dangling nodes the mass is identically 0.0 every round,
    # so skipping the term is algebraically exact; graphs WITH dangling
    # nodes keep the old per-round scalar unchanged. (round 13 — q148's
    # ring construction guarantees out-degree >= 1, and crawl graphs
    # are commonly pre-cleaned the same way.)
    has_dangling = not ranks.where(F.col("_deg").isNull()).isEmpty()
    base = F.lit(1.0 - damping)
    for _it in range(n_iters):
        if has_dangling:
            # dangling nodes hold their whole rank as redistributed mass
            dangling = (
                ranks.where(F.col("_deg").isNull())
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
            )
        per_edge = (
            e.join(ranks, e["_s"] == ranks["node"])
            .select(
                F.col("_s"),
                F.col("_d").alias("node"),
                (F.col("rank") / F.col("_deg")).alias("_c"),
            )
        )
        if ordered_sum:
            contrib = (
                per_edge.groupBy("node")
                .agg(
                    F.sort_array(
                        F.collect_list(F.struct("_s", "_c"))
                    ).alias("_l")
                )
                .select(
                    "node",
                    F.expr(
                        "aggregate(_l, cast(0.0 as double), "
                        "(a, x) -> a + x._c)"
                    ).alias("_contrib"),
                )
            )
        else:
            contrib = per_edge.groupBy("node").agg(
                F.sum("_c").alias("_contrib")
            )
        rebuilt = ranks.select("node", "_deg").join(contrib, "node", "left")
        if has_dangling:
            rebuilt = rebuilt.crossJoin(F.broadcast(dangling))
            inbound = F.coalesce(F.col("_contrib"), F.lit(0.0)) + F.col(
                "_dm"
            ) / F.lit(float(n_nodes))
        else:
            inbound = F.coalesce(F.col("_contrib"), F.lit(0.0))
        ranks = rebuilt.select(
            "node",
            "_deg",
            (base + F.lit(damping) * inbound).alias("rank"),
        )
        # r13: checkpoint every SECOND iterate (and the last — callers
        # receive a lineage-truncated frame as before). Lineage
        # truncation never changes values; each localCheckpoint call
        # costs a synchronous driver plan-compile (~0.2 s measured at
        # sf0.1), and a 2-iteration plan stays small (10 Exchange
        # mentions — plans/r13/q148_pagerank_lineage_after.txt), so
        # halving the checkpoint count halves that fixed cost while
        # bounding the recompute-on-loss span to 2 iterations.
        if (_it + 1) % 2 == 0 or (_it + 1) == n_iters:
            ranks = _ckpt(ranks)
    return ranks.select("node", "rank")


def _pagerank_fp(
    e: DataFrame,
    nodes: DataFrame,
    deg: DataFrame,
    n_nodes: int,
    n_iters: int,
    damping: float,
    scale: int,
    ckpt=None,
) -> DataFrame:
    """All-LONG PageRank power iteration (see ``pagerank`` docstring
    for the contract). Same plan shape as the float path: one
    (dst, contribution) shuffle with map-side partial INTEGER sums per
    round, broadcast degree table, per-round materialization via the
    caller-supplied ``ckpt`` (none/local/reliable)."""
    if ckpt is None:
        def ckpt(df):
            return df.localCheckpoint(eager=False)
    DEN = 10_000
    d_fp = int(round(damping * DEN))
    # worst case: one node holds the whole graph's mass, then the
    # damped update multiplies by d_fp before dividing
    if n_nodes * scale > (1 << 62) // DEN:
        raise ValueError(
            f"pagerank(fixed_point=True): n_nodes * scale = "
            f"{n_nodes * scale:.2e} risks LONG overflow against the "
            f"1e4 damping denominator; lower scale (currently {scale})"
        )
    S = F.lit(int(scale)).cast("long")
    base_fp = F.lit(int(scale - (d_fp * scale) // DEN)).cast("long")
    # degree carried on the rank frame, same rationale as the float
    # path (round 13): one static left join replaces the two
    # per-iteration degree joins and the per-round degree re-aggregate
    ranks = nodes.join(
        deg, nodes["node"] == deg["_s"], "left"
    ).select("node", "_deg", S.alias("rank_fp"))
    # same static dangling-skip as the float path: with no dangling
    # nodes, _dm == 0 every round and div(0, n) == 0, so dropping the
    # term (and its per-round aggregate + broadcast) is bit-exact
    has_dangling = not ranks.where(F.col("_deg").isNull()).isEmpty()
    for _it in range(n_iters):
        if has_dangling:
            dangling = ranks.where(F.col("_deg").isNull()).agg(
                F.coalesce(F.sum("rank_fp"), F.lit(0))
                .cast("long")
                .alias("_dm")
            )
        per_edge = (
            e.join(ranks, e["_s"] == ranks["node"])
            .select(
                F.col("_d").alias("node"),
                F.call_function("div", F.col("rank_fp"), F.col("_deg"))
                .alias("_c"),
            )
        )
        contrib = per_edge.groupBy("node").agg(
            F.sum("_c").cast("long").alias("_contrib")
        )
        rebuilt = ranks.select("node", "_deg").join(contrib, "node", "left")
        if has_dangling:
            rebuilt = rebuilt.crossJoin(F.broadcast(dangling))
            inbound = F.coalesce(F.col("_contrib"), F.lit(0)) + (
                F.call_function("div", F.col("_dm"), F.lit(int(n_nodes)))
            )
        else:
            inbound = F.coalesce(F.col("_contrib"), F.lit(0))
        ranks = rebuilt.select(
            "node",
            "_deg",
            (
                base_fp
                + F.call_function(
                    "div",
                    F.lit(d_fp).cast("long") * inbound,
                    F.lit(DEN),
                )
            ).alias("rank_fp"),
        )
        # same 2-iteration checkpoint cadence as the float path (r13):
        # truncation is value-free, the per-call driver compile is not
        if (_it + 1) % 2 == 0 or (_it + 1) == n_iters:
            ranks = ckpt(ranks)
    return ranks.select(
        "node",
        "rank_fp",
        (F.col("rank_fp") / F.lit(float(scale))).alias("rank"),
    )
