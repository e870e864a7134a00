"""Shuffle-skew diagnostics and salted two-phase aggregation.

At 100 TB every ``groupBy``/``join`` shuffles rows to the reducer that
owns their key; one heavy key becomes one straggler task that dominates
the stage's wall time. AQE's skew handling splits oversized JOIN inputs
(session.py enables it), but a skewed AGGREGATION key still lands every
row on a single reducer unless the aggregate itself is decomposed. This
module provides the two standard tools:

* :func:`key_skew_report` — measure BEFORE fixing: the heaviest keys'
  row counts, their share of the table, and a per-key skew factor
  (count / mean group size). Scale-safe by construction: the per-key
  count aggregate is map-side combined, the top-N pick is a
  TakeOrdered (no global sort shuffle), and only ``top_n`` + 1 scalar
  rows exist past the aggregate.
* :func:`salted_agg` — fix: two-phase aggregation over decomposable
  aggregates (count / integer sums / fixed-point tick sums / min /
  max). Phase 1 groups on ``(keys, salt)`` so a heavy key's rows
  spread across ``salt_buckets`` reducers; phase 2 re-combines the
  tiny partial table on the true keys. The result is BIT-EQUAL to the
  direct ``groupBy`` — counts and integer sums are associative-
  commutative, float inputs ride integer tick sums
  (:func:`~solar_data_tools_spark.operators.canonical.tick_sum`
  semantics), and min/max are order-free — which is exactly what lets
  the registry certify the salted plan against a plain ``GROUP BY``
  oracle (q175).

Measured honestly (round-9 probe, 50M rows, one key holding 40M =
skew factor 16000x, local[32]): the PLAIN groupBy ran 0.9 s vs 2.5 s
salted, because whole-stage-codegen partial aggregation already
collapses the hot key to one row per map task before the shuffle —
for combiner-friendly aggregates, Spark absorbs groupBy key skew
natively, and salting is pure overhead. ``salted_agg`` is therefore
the tool for the RESIDUAL class where no map-side combine happens: a
partial-agg-less plan (UDAF/guarded paths that block combining, or
``spark.sql.aggregate.partialaggregate``-style knobs), or as the
manual fallback when AQE is off. Key-skew victims that salting CANNOT
fix exactly — per-key ``collect_list``/window/grouped-map state that
genuinely needs every row of the hot key in one place — need a
different design (pre-aggregation or the bounded per-group contract
the fleet tier enforces; see ``parallel.grouped_apply`` and the probe
budget in ``tools/fleet_probe.py``). :func:`key_skew_report` is the
diagnosis step for ALL of these (joins included — AQE splits those at
runtime).

The reference has no distributed-shuffle notion at all (single-node
numpy; see SURVEY §4.1) — both operators are Spark-native scale
infrastructure, same tier as the bucketed layout in
``sources/layout.py``.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from solar_data_tools_spark.operators.canonical import (
    _TICK_SUM_GUARD,
    _WIDE_SUM_GUARD,
    pround,
    ticks,
)


def _as_list(keys: str | Sequence[str]) -> list[str]:
    return [keys] if isinstance(keys, str) else list(keys)


def key_skew_report(
    df: DataFrame,
    keys: str | Sequence[str],
    top_n: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Per-key shuffle-weight report for the ``top_n`` heaviest keys.

    Output: one row per heavy key, ordered by weight —
    ``keys..., cnt, rank, share, skew_factor, total_rows, n_keys`` where
    ``share = cnt / total_rows`` and ``skew_factor = (cnt / total_rows)
    * n_keys`` (a key's group size relative to the mean group size; a
    uniform key space scores ~1.0, and ``skew_factor ~= salt_buckets``
    is the signal that :func:`salted_agg` with that many buckets will
    level the stage).

    Plan shape at any scale: one map-side-combined count aggregate
    (shuffle = |distinct keys| rows), one scalar roll-up of that, a
    TakeOrdered top-N (never a global sort), and a broadcast of the
    1-row stats table. Ties break deterministically on the key columns
    ascending. ``skew_factor`` is computed as ``(cnt / total) * n_keys``
    — divide first — so the integer product can never overflow at
    petabyte row counts."""
    ks = _as_list(keys)
    counts = df.groupBy(*ks).agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    order = [F.col("cnt").desc()] + [F.col(k).asc() for k in ks]
    top = counts.orderBy(*order).limit(top_n)
    # row_number over <= top_n rows — bounded, not a scale-path window
    top = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    )
    out = top.crossJoin(F.broadcast(stats))
    share = F.col("cnt") / F.col("total_rows")
    return out.select(
        *ks,
        "cnt",
        "rank",
        pround(share, digits).alias("share"),
        pround(share * F.col("n_keys"), digits).alias("skew_factor"),
        "total_rows",
        "n_keys",
    )


def salted_agg(
    df: DataFrame,
    keys: str | Sequence[str],
    *,
    long_sums: Mapping[str, str] | None = None,
    tick_sums: Mapping[str, tuple[str, int]] | None = None,
    mins: Mapping[str, str] | None = None,
    maxs: Mapping[str, str] | None = None,
    count_alias: str | None = "n",
    salt_buckets: int = 32,
    salt_seed: int = 17,
    wide: bool = False,
) -> DataFrame:
    """Two-phase (salted) aggregation — exact, for decomposable
    aggregates, immune to key skew.

    ``long_sums``: ``out_name -> integral column`` (summed as LONG,
    overflow-guarded). ``tick_sums``: ``out_name -> (double column,
    digits)`` — each term quantizes to integer ticks so the salted
    two-phase sum is bit-equal to any other grouping order (the
    ``tick_sum`` contract), returned as ``ticks / 10^digits``.
    ``mins``/``maxs``: ``out_name -> column``. ``count_alias=None``
    drops the count column.

    ``wide=True`` (round 10) escalates every sum to DECIMAL(38,0) —
    the path the narrow overflow guard's error message names. Both
    phases sum in decimal (a hot key's PHASE-1 partial can itself
    outgrow LONG at 100 TB magnitudes, so the escalation must start at
    the first sum, not the recombine); ``long_sums`` outputs become
    exact DECIMAL(38,0), ``tick_sums`` outputs stay the familiar
    DOUBLE display value (decimal sum -> double / 10^d — hash-certify
    the decimal cast to STRING instead past 2^53 ticks, see
    ``canonical.tick_sum``).

    The salt is ``xxhash64(all input columns, salt_seed) mod
    salt_buckets`` — deterministic per row content, so the plan is
    replayable; duplicate rows of a hot key share a bucket, which
    narrows the spread — and in the degenerate-but-real worst case
    where the hot key's rows are byte-identical (the same event
    replayed millions of times), content-salting provides NO spread at
    all: every copy lands in one bucket and the straggler survives.
    That class needs either a distinguishing ingest column (an offset /
    row id in ``df.columns`` re-spreads it) or pre-aggregation of the
    duplicates upstream; a nondeterministic spread (partition-id in
    the salt) would fix the straggler but break the replay-certified
    plan contract this module promises, so it is deliberately not
    offered. Phase 1 shuffles on ``(keys, salt)`` (a heavy key's rows
    fan out over ``salt_buckets`` reducers, each holding ~1/buckets of
    the key's rows); phase 2 shuffles ``|keys| * salt_buckets`` partial
    rows — negligible at any scale. The overflow guard is evaluated in
    phase 2 from the re-combined ``max|term| * count`` bound, which
    also bounds every phase-1 partial, so the guard stays
    layout-independent.
    """
    ks = _as_list(keys)
    long_sums = dict(long_sums or {})
    tick_sums = dict(tick_sums or {})
    mins = dict(mins or {})
    maxs = dict(maxs or {})

    outs = (
        list(tick_sums) + list(long_sums) + list(mins) + list(maxs)
        + ([count_alias] if count_alias is not None else [])
    )
    dupes = sorted({o for o in outs if outs.count(o) > 1})
    if dupes:
        raise ValueError(
            "salted_agg: duplicate output names across count_alias/"
            f"long_sums/tick_sums/mins/maxs: {dupes} — every output "
            "(including the count alias) must be distinct, or the "
            "phase-1 partial aliases collide."
        )
    key_clash = sorted(set(outs) & set(ks))
    if key_clash:
        raise ValueError(
            "salted_agg: output names collide with key columns: "
            f"{key_clash} — the result frame would carry duplicate "
            "column names (ambiguous at first downstream reference)."
        )
    reserved = sorted(
        c
        for c in df.columns
        if c == "_salt" or c.startswith(("_p_", "_t_", "_l_"))
    )
    if reserved:
        raise ValueError(
            "salted_agg: input columns collide with reserved internal "
            f"names (_salt, _p_*, _t_*, _l_*): {reserved} — rename "
            "them before salting."
        )

    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns], F.lit(salt_seed)),
        F.lit(salt_buckets),
    ).alias("_salt")

    work = df.select("*", salt)
    for out, (col, digits) in tick_sums.items():
        work = work.withColumn(f"_t_{out}", ticks(col, digits))
    for out, col in long_sums.items():
        work = work.withColumn(f"_l_{out}", F.col(col).cast("long"))

    def _p1_sum(t: Column) -> Column:
        return F.sum(t.cast("decimal(38,0)") if wide else t)

    p1_aggs: list[Column] = [F.count(F.lit(1)).alias("_p_cnt")]
    for out in tick_sums:
        t = F.col(f"_t_{out}")
        p1_aggs += [
            _p1_sum(t).alias(f"_p_sum_{out}"),
            F.max(F.abs(t)).alias(f"_p_maxabs_{out}"),
            F.count(t).alias(f"_p_n_{out}"),
        ]
    for out in long_sums:
        t = F.col(f"_l_{out}")
        p1_aggs += [
            _p1_sum(t).alias(f"_p_sum_{out}"),
            F.max(F.abs(t)).alias(f"_p_maxabs_{out}"),
            F.count(t).alias(f"_p_n_{out}"),
        ]
    for out, col in mins.items():
        p1_aggs.append(F.min(col).alias(f"_p_min_{out}"))
    for out, col in maxs.items():
        p1_aggs.append(F.max(col).alias(f"_p_max_{out}"))

    partial = work.groupBy(*ks, "_salt").agg(*p1_aggs)

    guard_bound = _WIDE_SUM_GUARD if wide else _TICK_SUM_GUARD
    guard_kind = (
        "the DECIMAL(38,0) sum could overflow 38 digits. Drop digits "
        "— no wider escalation exists."
        if wide
        else "the LONG sum could wrap past 2^63. Drop digits or "
        "re-run with wide=True (DECIMAL(38,0))."
    )
    guard_cast = "decimal(38,0)" if wide else "long"

    def _guarded_recombine(out: str) -> Column:
        bound = F.max(f"_p_maxabs_{out}").cast("double") * F.sum(
            f"_p_n_{out}"
        )
        return (
            F.when(
                bound >= F.lit(guard_bound),
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"salted_agg({out}) overflow guard: "
                            "max|term| * count = "
                        ),
                        bound.cast("string"),
                        F.lit(f" >= {guard_bound:.1e}; {guard_kind}"),
                    )
                ).cast(guard_cast),
            )
            .otherwise(F.sum(f"_p_sum_{out}"))
        )

    p2_aggs: list[Column] = []
    if count_alias is not None:
        p2_aggs.append(F.sum("_p_cnt").alias(count_alias))
    for out, (_, digits) in tick_sums.items():
        recombined = _guarded_recombine(out)
        if wide:
            recombined = recombined.cast("double")
        p2_aggs.append(
            (recombined / F.lit(float(10**digits))).alias(out)
        )
    for out in long_sums:
        p2_aggs.append(_guarded_recombine(out).alias(out))
    for out in mins:
        p2_aggs.append(F.min(f"_p_min_{out}").alias(out))
    for out in maxs:
        p2_aggs.append(F.max(f"_p_max_{out}").alias(out))

    return partial.groupBy(*ks).agg(*p2_aggs)


def join_skew_report(
    left: DataFrame,
    right: DataFrame,
    keys: str | Sequence[str],
    top_n: int = 10,
) -> DataFrame:
    """Join co-skew diagnostics: the keys whose LEFT x RIGHT row-count
    product — the number of output pairs the join must materialize for
    that key — is largest. A key hot on ONE side is handled by AQE's
    skew splitting; a key hot on BOTH sides is the quadratic blowup no
    partitioner can fix (the fix is semantic: blocking/banding like the
    dedup tier, pre-aggregation, or dropping the key), and THIS is the
    report that finds those keys before the join runs.

    Scale shape: one map-side-combined count aggregate per side
    (shuffle = |distinct keys| rows each), a full-outer join of the two
    count tables (count rows, not data rows), a TakeOrdered top-N on
    pair volume. ``pair_volume = cnt_l * cnt_r`` is computed in DOUBLE
    (one IEEE multiply of two integer-valued doubles — identical in any
    engine; a LONG product would overflow at ~3e9 x 3e9). Keys absent
    from a side count 0 and produce 0 pairs (full-outer + coalesce) —
    they still appear if the table is small, which is itself a useful
    signal (no overlap). Ties break on the key columns ascending."""
    ks = _as_list(keys)
    lc = left.groupBy(*ks).agg(F.count(F.lit(1)).alias("cnt_l"))
    rc = right.groupBy(*ks).agg(F.count(F.lit(1)).alias("cnt_r"))
    j = lc.join(rc, ks, "full_outer").select(
        *ks,
        F.coalesce("cnt_l", F.lit(0)).alias("cnt_l"),
        F.coalesce("cnt_r", F.lit(0)).alias("cnt_r"),
    )
    pv = (
        F.col("cnt_l").cast("double") * F.col("cnt_r").cast("double")
    ).alias("pair_volume")
    j = j.select(*ks, "cnt_l", "cnt_r", pv)
    order = [F.col("pair_volume").desc()] + [F.col(k).asc() for k in ks]
    top = j.orderBy(*order).limit(top_n)
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    )


def _truncate_per_key(
    df: DataFrame,
    ks: list[str],
    cap: int,
    order_cols: list[str],
    salt_buckets: int = 32,
) -> DataFrame:
    """Exact per-key top-``cap`` truncation without a hot-key straggler:
    classic two-phase top-k. Phase A ranks within ``(keys, salt)`` —
    content-salted on the order columns, so a hot key's rows spread
    over ``salt_buckets`` reducers and each bucket keeps at most
    ``cap`` candidates (the per-bucket top-cap is a guaranteed superset
    of the global top-cap). Phase B re-ranks the surviving
    ``<= salt_buckets * cap`` rows per key — bounded regardless of how
    hot the key was. The kept SET is identical to a single global
    window (and deterministic when the order tuple is unique per row —
    the caller contract)."""
    order = [F.col(c).asc() for c in order_cols]
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in ks + order_cols]),
        F.lit(salt_buckets),
    )
    wa = Window.partitionBy(*ks, "_cap_salt").orderBy(*order)
    phase_a = (
        df.withColumn("_cap_salt", salt)
        .withColumn("_cap_rn", F.row_number().over(wa))
        .where(F.col("_cap_rn") <= cap)
        .drop("_cap_salt", "_cap_rn")
    )
    wb = Window.partitionBy(*ks).orderBy(*order)
    return (
        phase_a.withColumn("_cap_rn", F.row_number().over(wb))
        .where(F.col("_cap_rn") <= cap)
        .drop("_cap_rn")
    )


def capped_join(
    left: DataFrame,
    right: DataFrame,
    keys: str | Sequence[str],
    *,
    cap_left: int,
    cap_right: int,
    order_left: Sequence[str],
    order_right: Sequence[str],
    salt_buckets: int = 32,
    report_order_ties: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Certified mitigation for the both-sides-hot join class
    :func:`join_skew_report` diagnoses (round 10, r9 verdict item 6):
    inner-join the two sides with each key truncated to a DETERMINISTIC
    top-``cap`` per side, so the worst key emits at most ``cap_left *
    cap_right`` pairs instead of ``cnt_l * cnt_r`` — the quadratic
    blowup no partitioner or AQE split can absorb (both reports and
    fixes operate BEFORE the join materializes anything).

    ``order_left`` / ``order_right`` name the columns defining which
    rows survive (ascending, unique-tuple-per-row by caller contract —
    an id column makes it total). Truncation is the exact two-phase
    top-k of :func:`_truncate_per_key`: no single reducer ever sorts a
    full hot key, yet the kept set equals the global window's.

    Returns ``(joined, report)``. ``report`` is the honest spill
    ledger, one row per key appearing on either side: pre-truncation
    counts, per-side dropped-row counts, emitted vs true pair volume
    (DOUBLE product — LONG would overflow at ~3e9 x 3e9) — the scale
    shape is count tables only, exactly like ``join_skew_report``.
    A row with ``dropped_l = dropped_r = 0`` passed through untouched;
    the caller decides whether the capped result is acceptable or the
    key needs a semantic fix (pre-aggregation, blocking, drop).

    ``report_order_ties=True`` (ADVICE r10) audits the unique-order-
    tuple contract instead of trusting it: the report gains
    ``order_ties_l`` / ``order_ties_r`` = rows minus distinct order
    tuples per key per side — any value > 0 means the contract is
    violated and a tie straddling a cap cutoff could keep a different
    row on a different run. Off by default because the distinct
    aggregation shuffles (key, order-tuple) pairs — the same magnitude
    as the join input — where the base report shuffles count tables
    only; turn it on when first certifying a new input, off in steady
    state.
    """
    ks = _as_list(keys)
    reserved = sorted(
        {"_cap_salt", "_cap_rn"}
        & (set(left.columns) | set(right.columns))
    )
    if reserved:
        raise ValueError(
            "capped_join: input columns collide with reserved internal "
            f"names: {reserved} — rename them before joining."
        )
    shared = sorted(
        (set(left.columns) & set(right.columns)) - set(ks)
    )
    if shared:
        raise ValueError(
            "capped_join: non-key columns present on BOTH sides: "
            f"{shared} — the joined frame would carry ambiguous "
            "duplicate names; alias one side first."
        )
    tl = _truncate_per_key(
        left, ks, int(cap_left), list(order_left), salt_buckets
    )
    tr = _truncate_per_key(
        right, ks, int(cap_right), list(order_right), salt_buckets
    )
    joined = tl.join(tr, ks, "inner")

    l_aggs = [F.count(F.lit(1)).alias("cnt_l")]
    r_aggs = [F.count(F.lit(1)).alias("cnt_r")]
    if report_order_ties:
        l_aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(F.struct(*[F.col(c) for c in order_left]))
            ).alias("order_ties_l")
        )
        r_aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(F.struct(*[F.col(c) for c in order_right]))
            ).alias("order_ties_r")
        )
    lc = left.groupBy(*ks).agg(*l_aggs)
    rc = right.groupBy(*ks).agg(*r_aggs)
    tie_cols = (
        [
            F.coalesce("order_ties_l", F.lit(0)).alias("order_ties_l"),
            F.coalesce("order_ties_r", F.lit(0)).alias("order_ties_r"),
        ]
        if report_order_ties
        else []
    )
    cj = lc.join(rc, ks, "full_outer").select(
        *ks,
        F.coalesce("cnt_l", F.lit(0)).alias("cnt_l"),
        F.coalesce("cnt_r", F.lit(0)).alias("cnt_r"),
        *tie_cols,
    )
    kept_l = F.least(F.col("cnt_l"), F.lit(int(cap_left)))
    kept_r = F.least(F.col("cnt_r"), F.lit(int(cap_right)))
    report = cj.select(
        *ks,
        "cnt_l",
        "cnt_r",
        (F.col("cnt_l") - kept_l).alias("dropped_l"),
        (F.col("cnt_r") - kept_r).alias("dropped_r"),
        (kept_l.cast("double") * kept_r.cast("double")).alias(
            "emitted_pairs"
        ),
        (
            F.col("cnt_l").cast("double") * F.col("cnt_r").cast("double")
        ).alias("true_pairs"),
        *(
            [F.col("order_ties_l"), F.col("order_ties_r")]
            if report_order_ties
            else []
        ),
    )
    return joined, report
