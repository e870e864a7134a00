"""Structural certification rule: no builtin rounding rides an oracle
hash.

Rounds 6-7 chased the same defect class one query at a time — engine
``round()`` builtins legitimately disagree on half-boundary doubles
(Spark rounds the exact binary expansion via BigDecimal; DuckDB
multiplies first), and libm transcendentals differ in the last ulp —
so round 8 encodes the rule once:

* the Spark side of every certified query rounds ONLY via
  ``canonical.pround`` (the floor/mul pattern), never ``F.round``;
* the DuckDB side spells the identical ``floor((x) * 1e{d} + 0.5) /
  1e{d}`` ops, never builtin ``round()``;
* q143's ranking key is integer fixed-point end to end (no DoubleType
  at all) — the two-rounds-red driver row that motivated the rule.

These are source-level lints: they run in milliseconds and fail the
suite the moment someone reintroduces the trap, before any driver
window can catch it on real data.
"""

from __future__ import annotations

import inspect
import re

from solar_data_tools_spark import registry

# builtin round( not preceded by an identifier char (excludes pround(,
# _pround(, and method names like np.round which don't appear in SQL)
_SQL_ROUND = re.compile(r"(?<![A-Za-z0-9_.])round\(")

# Documented exceptions: q119's oracle models numpy's rounding INSIDE the
# resize engine analytically; its inputs are engineered off half
# boundaries (see the q119 docstring) and the final projection is still
# floor-pattern rounded.
_SQL_ALLOWLIST = {"q119_media_resize"}


def _certified():
    return {
        name: spec
        for name, spec in registry.QUERIES.items()
        if spec.oracle is not None
    }


def test_no_builtin_round_anywhere_in_registry_source():
    src = inspect.getsource(registry)
    assert "F.round(" not in src, (
        "builtin F.round reintroduced in registry.py — use _pround "
        "(canonical.pround); see its docstring for the half-boundary "
        "divergence it prevents"
    )


def test_no_builtin_round_in_certified_oracle_sql():
    offenders = {}
    for name, spec in _certified().items():
        if name in _SQL_ALLOWLIST:
            continue
        hits = _SQL_ROUND.findall(spec.oracle)
        if hits:
            offenders[name] = len(hits)
    assert not offenders, (
        f"builtin round() in certified oracle SQL (use the "
        f"floor((x) * 1eD + 0.5) / 1eD pattern): {offenders}"
    )


def test_no_builtin_round_in_certified_query_sources():
    offenders = []
    seen = set()
    for name, spec in _certified().items():
        fn = spec.fn
        key = getattr(fn, "__qualname__", name)
        if key in seen:
            continue
        seen.add(key)
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            continue
        if "F.round(" in src:
            offenders.append(name)
    assert not offenders, (
        f"builtin F.round in certified query functions: {offenders}"
    )


def test_no_float_sums_under_pround_in_certified_sources():
    """Rounding a partition-parallel FLOAT sum only shrinks the flip
    window — Spark's and DuckDB's float sums drift by ulps and the
    rounding amplifies a ulp into a tick whenever the true sum sits
    near a half-tick (the q148 failure mode; latent in every certified
    float sum until round 8). Certified sums/avgs of doubles must go
    through ``_psum``/``_pavg`` (per-term integer ticks, order-free
    LONG sum). Sums of INTEGER-cast terms are exact in any order and
    stay allowed (allowlisted per query below)."""
    # integer-cast aggregates: exact-by-construction (integer-valued
    # doubles < 2^53 sum exactly, order-free)
    allow = {"q13_daily_density", "q82_quality_counts"}
    pat = re.compile(r"_pround\(\s*F\.(sum|avg)\(")
    offenders = []
    for name, spec in _certified().items():
        if name in allow:
            continue
        try:
            src = inspect.getsource(spec.fn)
        except (OSError, TypeError):
            continue
        if pat.search(src):
            offenders.append(name)
    assert not offenders, (
        f"float sum/avg under _pround in certified queries (use "
        f"_psum/_pavg): {offenders}"
    )


# ---------------------------------------------------------------------------
# Round-9 widening (r8 verdict item 1): the lint above only sees registry
# source, so a certified query that CALLS an operator helper hashing a
# float aggregate passed unconverted — exactly where q16/q24/q25/q30/
# q31/q32 and the classifier family (q138/q140/q147/q155/q156) lived.
# This lint walks one level into every package function a certified
# query references (both ``alias.func(...)`` calls and functions
# imported inside the query body) and enforces:
#   1. a helper exposing ``exact_digits`` MUST be called with it — the
#      tick-exact path is the certified contract, the float path is for
#      non-certified callers;
#   2. a helper WITHOUT the parameter whose source contains
#      ``F.sum(``/``F.avg(`` must be hand-audited order-free (integer or
#      fixed-point-LONG terms) and listed below with its justification.
# ---------------------------------------------------------------------------

# (module tail, function) -> why its F.sum/F.avg terms are exact in any
# association (integer-valued or fixed-point LONG — no float drift)
_AUDITED_ORDER_FREE_HELPERS = {
    ("curation", "unigram_logprob"):
        "sums integer gram counts and _logp_fp fixed-point LONGs",
    ("curation", "bigram_logprob"):
        "sums integer gram counts and _logp_fp fixed-point LONGs",
    ("curation", "excise_contaminated_spans"):
        "sums integer span lengths / break flags",
    ("curation", "duplicate_clusters"):
        "label-propagation sums of integer labels (driver-side ints)",
    ("curation", "dsir_select"):
        "sums integer cnt and _lr_fp fixed-point LONGs (q143 recipe)",
    ("dedup", "simhash"):
        "sums +-1 integer bit votes",
    ("dedup", "substring_duplicate_spans"):
        "running sums of integer break flags",
    ("dedup", "line_dedup_ccnet"):
        "running sums of integer break flags",
    ("sampling", "budget_mix"):
        "sums integer token counts",
    ("sampling", "global_shuffle_rank"):
        "windowed sums of integer counts",
    ("sampling", "pack_sequences"):
        "windowed sums of integer token counts",
    ("sampling", "temperature_rebalance"):
        "sums integer token counts",
    ("windows", "find_runs"):
        "running sums of integer change flags",
    # ("text", "rrf_fuse") retired r10: rewritten as a full-outer join
    # with ONE structural binary addition — no F.sum in its source, so
    # the lint no longer needs an exemption for it.
    ("similarity", "train_ivf_centroids_distributed"):
        "Lloyd mean updates ARE float sums, but q137 probes every cell "
        "(n_probe == n_cells), so the certified output is the exhaustive "
        "top-k — independent of the trained centroids by construction; "
        "any float drift moves vectors between cells, never in or out "
        "of the probe-all candidate set (oracle = Q46 brute-force SQL)",
    ("text", "novelty_scores"):
        "sums integer (df >= 2) indicator casts",
    ("sampling", "token_budget_cut"):
        "running/grouped sums of integer token counts",
    ("sampling", "weighted_shuffle_rank"):
        "windowed sums of integer counts",
    ("graph", "pagerank"):
        "certified path (fixed_point=True, q148) delegates to "
        "_pagerank_fp whose trajectory is all-LONG; the float sums "
        "are the non-certified variant's",
    # ("windows", "segment_pooled_diffs") retired r10: the helper now
    # exposes exact_digits (certified callers must pass it — lint
    # branch 1) and its no-digits path RAISES at execution on any
    # non-integer-valued diff, so the old allowlist justification is
    # enforced in code (tests/test_components.py pins both).
    ("canonical", "guarded_wide_sum"):
        "sums LONG tick terms in DECIMAL(38,0) — exact integer "
        "arithmetic, order-free by construction (q179)",
}

_FLOAT_AGG = re.compile(
    r"F\.(sum|avg|mean|stddev|stddev_pop|stddev_samp|var_pop|var_samp|"
    r"variance|skewness|kurtosis)\("
)


def _package_calls(fn):
    """Yield (label, target_function, ast.Call) for every call in
    ``fn``'s source that resolves to a solar_data_tools_spark function —
    via a module alias (``wd.rolling_mean(...)``) or a name imported
    inside the function body (``linear_classifier_score(...)``)."""
    import ast
    import importlib
    import textwrap

    try:
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
    except (OSError, TypeError, SyntaxError):
        return
    imported = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and (
            node.module.startswith("solar_data_tools_spark")
        ):
            mod = importlib.import_module(node.module)
            for a in node.names:
                imported[a.asname or a.name] = getattr(mod, a.name, None)
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        f = node.func
        target = label = None
        if isinstance(f, ast.Name) and f.id in imported:
            target, label = imported[f.id], f.id
        elif isinstance(f, ast.Attribute) and isinstance(f.value, ast.Name):
            modobj = getattr(registry, f.value.id, None)
            if inspect.ismodule(modobj) and modobj.__name__.startswith(
                "solar_data_tools_spark"
            ):
                target = getattr(modobj, f.attr, None)
                label = f"{f.value.id}.{f.attr}"
        if inspect.isfunction(target):
            yield label, target, node


def test_certified_helper_float_aggregates_are_tick_exact():
    offenders = []
    for name, spec in _certified().items():
        for label, fn, call in _package_calls(spec.fn):
            try:
                hsrc = inspect.getsource(fn)
            except (OSError, TypeError):
                continue
            if "exact_digits" in str(inspect.signature(fn)):
                if "exact_digits" not in {k.arg for k in call.keywords}:
                    offenders.append(
                        (name, label, "must pass exact_digits=R")
                    )
            elif _FLOAT_AGG.search(hsrc):
                key = (fn.__module__.rsplit(".", 1)[-1], fn.__name__)
                if key not in _AUDITED_ORDER_FREE_HELPERS:
                    offenders.append(
                        (name, label,
                         "float F.sum/F.avg in helper — add exact_digits "
                         "or audit and allowlist")
                    )
    assert not offenders, (
        "certified queries reference helpers with unconverted float "
        f"aggregates: {offenders}"
    )


def test_no_nondeterminism_in_certified_query_sources():
    """A certified query must be a pure function of the input tables:
    RNG columns, partition-dependent ids, and wall-clock functions can
    never hash-match a single-node oracle (and would flake across
    layouts even if they did once)."""
    banned = (
        "F.rand(",
        "F.randn(",
        "monotonically_increasing_id",
        "current_timestamp",
        "current_date",
        "spark_partition_id",
    )
    offenders = {}
    for name, spec in _certified().items():
        try:
            src = inspect.getsource(spec.fn)
        except (OSError, TypeError):
            continue
        hits = [b for b in banned if b in src]
        if hits:
            offenders[name] = hits
    assert not offenders, (
        f"nondeterministic constructs in certified queries: {offenders}"
    )


def test_q143_projection_is_all_integer(spark):
    """The DSIR driver row went red twice on float columns riding the
    hash; the fix is structural — assert the certified projection has
    no floating-point column at all (LONGs + rank only)."""
    from pyspark.sql.types import DoubleType, FloatType

    sdf = registry.QUERIES["q143_dsir_selection"].fn(
        spark, "/root/testdata/sf0.001"
    )
    floats = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (DoubleType, FloatType))
    ]
    assert not floats, (
        f"q143 certified projection must be all-integer, found {floats}"
    )


def test_gumbel_fp6_matches_pure_python_reference(spark):
    """Bit-exactness of the fixed-point Gumbel across Spark and an
    independent pure-Python evaluation of the same integer algorithm
    (the DuckDB side is pinned by q143's oracle run; this pins the
    Spark side against drift in either engine's arithmetic)."""
    from pyspark.sql import functions as F

    from solar_data_tools_spark.operators.sampling import with_gumbel_fp6

    S = 1 << 30
    LN2 = 744261118
    SQ = 1518500249

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    def ilog(x):
        k = x.bit_length() - 1
        m = (x << (30 - k)) if k <= 30 else (x >> (k - 30))
        if m > SQ:
            k += 1
            m >>= 1
        t = tdiv((m - S) * S, m + S)
        t2 = tdiv(t * t, S)
        t3 = tdiv(t2 * t, S)
        t5 = tdiv(t3 * t2, S)
        t7 = tdiv(t5 * t2, S)
        t9 = tdiv(t7 * t2, S)
        return k, 2 * (
            t + tdiv(t3, 3) + tdiv(t5, 5) + tdiv(t7, 7) + tdiv(t9, 9)
        )

    def gref(h):
        h = max(h, 1)
        k1, l1 = ilog(h)
        eln = max((32 - k1) * LN2 - l1, 1)
        k2, l2 = ilog(eln)
        return tdiv(((30 - k2) * LN2 - l2 + 4 * S) * 1000000, S) - 4000000

    # edge cases: clamp, both shift directions, sqrt2-renorm boundary,
    # extreme tail, plus a deterministic spread
    hs = sorted(
        set(
            [0, 1, 2, 3, (1 << 31) - 1, 1 << 31, (1 << 32) - 1, SQ, SQ + 1]
            + [(i * 2654435761) % (1 << 32) for i in range(500)]
        )
    )
    sdf = spark.createDataFrame([(h,) for h in hs], "h long")
    got = {
        r["h"]: r["g"]
        for r in with_gumbel_fp6(sdf, F.col("h"), "g").collect()
    }
    for h in hs:
        assert got[h] == gref(h), (h, got[h], gref(h))


# ---------------------------------------------------------------------------
# Round 10 (r9 verdict item 5): the transcendental-margin audit is now
# STRUCTURAL. Any certified query whose plan reaches a libm-backed
# transcendental (directly or through package helpers, walked to depth
# 3) must carry a margin probe in tests/test_tick_margins.py —
# registered there in MARGIN_AUDITED — so the audit cannot be forgotten
# when the next solar-geometry / classifier / sampling query lands.
# F.sqrt (and F.hypot's sqrt core) are NOT flagged: IEEE 754 requires
# correctly-rounded sqrt, so it is engine-exact like +-*/ — the risk
# class is libm's last-ulp freedom in sin/cos/tan/exp/log/pow/....
# ---------------------------------------------------------------------------

_TRANSCENDENTAL = re.compile(
    r"F\.(sin|cos|tan|asin|acos|atan|atan2|exp|expm1|log|log1p|log2|"
    r"log10|pow|power|sinh|cosh|tanh|cbrt|hypot)\("
)

# certified queries whose transcendental use provably never reaches a
# hashed value — each entry carries the audited justification
_TRANS_EXEMPT: dict[str, str] = {}


def _package_callees(fn):
    """Package functions called from ``fn``: module-alias attributes
    (``sol.calc_lon``), names imported inside the body, AND
    module-global names (lambdas wrapping a registry query, helpers
    calling siblings)."""
    import ast
    import importlib
    import sys as _sys
    import textwrap

    out = []
    try:
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
    except (OSError, TypeError, SyntaxError):
        return out
    imported = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and (
            node.module.startswith("solar_data_tools_spark")
        ):
            mod = importlib.import_module(node.module)
            for a in node.names:
                imported[a.asname or a.name] = getattr(mod, a.name, None)
    own_mod = _sys.modules.get(fn.__module__)
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        f = node.func
        target = None
        if isinstance(f, ast.Name):
            target = imported.get(f.id) or getattr(own_mod, f.id, None)
        elif isinstance(f, ast.Attribute) and isinstance(f.value, ast.Name):
            modobj = getattr(registry, f.value.id, None) or getattr(
                own_mod, f.value.id, None
            )
            if inspect.ismodule(modobj) and modobj.__name__.startswith(
                "solar_data_tools_spark"
            ):
                target = getattr(modobj, f.attr, None)
        if inspect.isfunction(target) and target.__module__.startswith(
            "solar_data_tools_spark"
        ):
            out.append(target)
    return out


def _transcendental_certified_queries():
    flagged = {}
    for name, spec in _certified().items():
        seen, frontier, srcs = set(), [spec.fn], []
        for _depth in range(3):
            nxt = []
            for f in frontier:
                if f in seen:
                    continue
                seen.add(f)
                try:
                    srcs.append(inspect.getsource(f))
                except (OSError, TypeError):
                    pass
                nxt.extend(_package_callees(f))
            frontier = nxt
        hits = set()
        for s in srcs:
            hits.update(_TRANSCENDENTAL.findall(s))
        if hits:
            flagged[name] = sorted(hits)
    return flagged


def test_transcendental_queries_have_margin_audits():
    from tests.test_tick_margins import MARGIN_AUDITED

    flagged = _transcendental_certified_queries()
    unaudited = {
        n: fs
        for n, fs in flagged.items()
        if n not in MARGIN_AUDITED and n not in _TRANS_EXEMPT
    }
    assert not unaudited, (
        "certified queries hash transcendental-derived values without a "
        f"margin probe in tests/test_tick_margins.py: {unaudited} — add "
        "a probe + MARGIN_AUDITED entry (or a justified _TRANS_EXEMPT)"
    )
    stale = (set(MARGIN_AUDITED) | set(_TRANS_EXEMPT)) - set(flagged)
    assert not stale, (
        f"stale margin-audit entries (no transcendental found): {stale}"
    )


def test_oracle_result_types_have_pandas_exact_renderings():
    """The driver hashes canonical string renderings of BOTH engines'
    results; DuckDB types that pandas materializes as float64 while Spark
    emits an integer (HUGEINT from sum(BIGINT), un-cast DECIMAL) render
    '945405.0' vs '945405' and hash-fail even when every value is equal —
    the r10 q178 incident (VERDICT r10 "What's wrong" #1). DuckDB exposes
    the result schema without executing, so this lint bans the whole class
    structurally: no certified oracle may emit HUGEINT/UHUGEINT (Spark has
    no int128 — drift is guaranteed) or DECIMAL (materializes float64;
    cast to DOUBLE for float semantics or BIGINT for integer semantics so
    the intent is explicit in the SQL)."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    banned = ("HUGEINT", "UHUGEINT", "DECIMAL")
    offenders = {}
    for name, spec in _certified().items():
        rel = con.sql(spec.oracle)
        hits = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if any(b in str(t).upper() for b in banned)
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "oracle SQL result columns with pandas-inexact DuckDB types "
        f"(cast to BIGINT or DOUBLE): {offenders}"
    )
