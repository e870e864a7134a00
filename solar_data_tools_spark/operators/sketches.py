"""Mergeable sketches for corpus-scale statistics.

Cardinality rides the engine-exact HyperLogLog below (``hll_build`` /
``hll_estimate``, q151/q170; Spark's built-in ``approx_count_distinct``
remains the zero-dependency fast option when cross-engine certification
isn't needed); this module adds the count-min sketch
— the heavy-hitter / frequency-estimate companion. At 100 TB an exact
token-frequency table means shuffling |vocab| keys (billions for web
n-grams); a CMS reduces the aggregate to a fixed ``depth x width`` grid
with map-side combine, at the cost of a one-sided overestimate bounded
by ``e * total / width`` with probability ``1 - e^-depth``
(Cormode & Muthukrishnan 2005).

The bucket hash is md5-derived (the engine-portable convention of
``hash_uniform``), so sketch construction AND point queries are exactly
replayable in DuckDB — the q163 oracle certifies both ends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solar_data_tools_spark.operators.dedup import normalize_text


def _bucket(col, d: int, width: int, seed) -> F.Column:
    h = F.md5(F.concat(F.lit(f"{seed}:{d}:"), col.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width)
    )


def cms_build(
    docs: DataFrame,
    width: int = 1024,
    depth: int = 4,
    text_col: str = "text",
    seed: int | str = 0,
) -> DataFrame:
    """Build a count-min sketch over the corpus's tokens.

    One explode + one (d, bucket)-keyed aggregate; with map-side
    combine each task emits at most ``depth * width`` partial rows no
    matter how much text it scanned — the whole shuffle is a few KB per
    partition, like the HLL path. Output: (d, bucket, cnt), at most
    ``depth * width`` rows.
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


def cms_estimate(
    cms: DataFrame,
    tokens: DataFrame,
    width: int = 1024,
    depth: int = 4,
    token_col: str = "token",
    seed: int | str = 0,
) -> DataFrame:
    """Point-query a count-min sketch: estimate(token) = min over rows
    d of cms[d][h_d(token)] — a one-sided overestimate of the true
    frequency.

    The sketch is at most ``depth * width`` rows and broadcasts; the
    token probe set joins it ``depth`` times cheaper than any corpus
    re-scan. Missing buckets read as 0 (token never seen).

    Output: (``token_col``, ``cms_cnt``) — ONLY the token column
    survives (the probe explodes ``depth`` ways and re-groups on the
    token alone); join the result back to the probe table to recover
    other columns, as q163 does with its true-count side.
    """
    probes = tokens.select(
        F.col(token_col),
        F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1))).alias("d"),
    )
    expr = None
    for d in range(int(depth)):
        b = _bucket(F.col(token_col), d, width, seed)
        expr = F.when(F.col("d") == d, b) if expr is None else expr.when(
            F.col("d") == d, b
        )
    probes = probes.select(token_col, "d", expr.alias("bucket"))
    joined = probes.join(F.broadcast(cms), ["d", "bucket"], "left")
    return (
        joined.groupBy(token_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_cnt")
        )
    )


def _check_hll_p(p: int) -> None:
    """The asymptotic bias constant alpha_m = 0.7213/(1 + 1.079/m) used
    below is only valid for m >= 128 (p >= 7); standard HLL substitutes
    0.673/0.697/0.709 for m = 16/32/64 (Flajolet et al. 2007, Fig. 3).
    Rather than carry rarely-exercised small-m constants, reject small
    precisions outright — p < 7 gives >= 9% standard error and has no
    large-scale use (r8 ADVICE item)."""
    if int(p) < 7 or int(p) > 30:
        raise ValueError(
            f"hll: p={p} out of range [7, 30] — the alpha_m constant "
            "requires m >= 128 (p >= 7); use p=12 (default) for ~1.6% "
            "error"
        )


def hll_build(
    df: DataFrame,
    token_col: str = "token",
    group_cols: list[str] | None = None,
    p: int = 12,
    seed: int | str = 0,
) -> DataFrame:
    """Deterministic HyperLogLog register table (Flajolet et al. 2007)
    — the cardinality companion of ``cms_build`` when the ESTIMATE must
    be engine-exact and mergeable, which Spark's built-in
    ``approx_count_distinct`` (q151) is not: its HLL++ hash is
    JVM-internal, so no external oracle can replay it, and two engines
    never agree bit-for-bit.

    Construction is pure integer arithmetic on md5 bits: take 60 bits
    of ``md5(seed || ':' || token)`` (the ``md5_60`` convention of the
    MinHash pipeline), split into a ``p``-bit bucket and a
    ``(60-p)``-bit tail, and record per bucket the max rank
    ``rho = (60-p) - bit_length(tail) + 1`` (the 1-based position of
    the tail's leading 1-bit; an all-zero tail scores ``61-p``).
    Registers merge by MAX, so the table is a partial-aggregate-friendly
    groupBy bounded at ``2^p`` rows per group — at 100 TB the shuffle
    carries at most ``|groups| * 4096`` rows regardless of corpus size,
    the same discipline as the CMS grid.

    Output: (*group_cols, bucket LONG, rho INT) — all integers, so the
    register table itself is hash-certifiable against a DuckDB replay
    (q170). Empty buckets are absent (they read as rho 0 at estimate
    time).
    """
    _check_hll_p(p)
    g = list(group_cols or [])
    tail_bits = 60 - int(p)
    h = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(token_col).cast("string"))
    )
    h60 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    bucket = F.call_function(
        "shiftright", h60, F.lit(tail_bits)
    ).alias("bucket")
    tail = F.pmod(h60, F.lit(1 << tail_bits))
    # bit_length(tail) = length(bin(tail)) except bin(0) = '0' has
    # length 1; the all-zero tail is exactly the rho = tail_bits + 1
    # case, handled by the WHEN
    rho = F.when(tail == 0, F.lit(tail_bits + 1)).otherwise(
        F.lit(tail_bits) - F.length(F.bin(tail)) + F.lit(1)
    )
    return (
        df.select(*g, bucket, rho.cast("int").alias("_rho"))
        .groupBy(*g, "bucket")
        .agg(F.max("_rho").alias("rho"))
    )


def _ln_fp6_int(x: int) -> int:
    """Pure-Python evaluation of the package's integer fixed-point ln
    (``sampling._ilog_fp_steps`` + the 1e-6 rescale of
    ``with_ln_fp6``) for a positive int — op-for-op identical (same
    shifts, same truncate-toward-zero divisions), so a CONSTANT like
    ``ln_fp6(m)`` can be inlined as the same literal on the Spark and
    DuckDB sides instead of running the column chain on a constant.
    Pinned against the Spark column in tests/test_hll_weighted.py."""
    if x <= 0:
        raise ValueError("ln_fp6 needs a positive integer")
    S = 1 << 30
    LN2 = 744261118
    SQ = 1518500249

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    k0 = x.bit_length() - 1
    m0 = x << (30 - k0) if k0 <= 30 else x >> (k0 - 30)
    k, m = (k0 + 1, m0 >> 1) if m0 > SQ else (k0, m0)
    t = tdiv((m - S) * S, m + S)
    t2 = tdiv(t * t, S)
    t3 = tdiv(t2 * t, S)
    t5 = tdiv(t3 * t2, S)
    t7 = tdiv(t5 * t2, S)
    t9 = tdiv(t7 * t2, S)
    l = 2 * (
        t + tdiv(t3, 3) + tdiv(t5, 5) + tdiv(t7, 7) + tdiv(t9, 9)
    )
    return tdiv((k * LN2 + l) * 1000000, S)


def _hll_alpha_num(p: int) -> float:
    """The estimator's numerator ``alpha_m * m^2 * 2^R`` — ONE
    definition (same literals, same left-associated evaluation order)
    shared by :func:`hll_estimate`, :func:`_linear_count_threshold`,
    and the registry's SQL-mirror constant, so the three can never
    drift apart bitwise (the s_fp threshold only corresponds to
    ``raw <= 2.5 m`` while they agree exactly)."""
    m = 1 << int(p)
    big_r = 61 - int(p)
    return 0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << big_r)


def _linear_count_threshold(p: int) -> int:
    """Integer s_fp threshold equivalent to HLL's ``raw_est <= 2.5 m``
    small-range switch: ``raw = alpha_num / s_fp <= 2.5 m  <=>  s_fp >=
    alpha_num / (2.5 m)``. Computed ONCE in Python and inlined as a
    literal on both engines, so the branch decision is a deterministic
    integer comparison — never a float compare that could flip on an
    engine ulp."""
    import math

    m = 1 << int(p)
    return math.ceil(_hll_alpha_num(p) / (2.5 * m))


def hll_merge(
    *register_tables: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge ``hll_build`` register tables (same p/seed by contract):
    registers combine by per-bucket MAX, so the union of any number of
    sketches — built on different days, sources, or clusters — is one
    groupBy away, and ``hll_estimate`` over the merged table estimates
    the cardinality of the UNION of the underlying sets exactly as if
    built in one pass (bit-identical: max is associative-commutative-
    idempotent, the defining property that makes HLL a mergeable
    sketch). This is the incremental-corpus path at 100 TB: per-dump
    register tables are a few KB each, persist cheaply, and a fleet-
    wide distinct count never rescans history."""
    if not register_tables:
        raise ValueError(
            "hll_merge needs at least one register table"
        )
    g = list(group_cols or [])
    it = iter(register_tables)
    u = next(it)
    for t in it:
        u = u.unionByName(t)
    return u.groupBy(*g, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 12,
    linear_counting: bool = False,
) -> DataFrame:
    """Cardinality estimate from an ``hll_build`` register table, with
    the harmonic sum kept EXACT in integer arithmetic so the estimate
    is bit-identical across engines and partition layouts:

        sum_j 2^(-rho_j)  =  s_fp / 2^R,   R = 61 - p

    where ``s_fp = sum(2^(R - rho_j))`` over PRESENT buckets plus
    ``2^R`` per absent bucket (rho 0) — every term a power of two, the
    sum an exact LONG (max ``2^p * 2^R = 2^61``, no overflow). The only
    float op is the final ``alpha_m * m^2 * 2^R / s_fp`` — two IEEE
    multiplications and one division on identical inputs in any engine.

    The raw estimate historically shipped WITHOUT the small-range
    linear-counting correction (that branch needs ``ln``, whose
    last-ulp engine divergence is exactly what this module's
    determinism contract bans). ``linear_counting=True`` (round 10)
    closes that gap deterministically: the correction ``m * ln(m /
    n_zero)`` rides the package's INTEGER fixed-point ln
    (``sampling.with_ln_fp6`` — pure LONG arithmetic, bit-identical in
    any engine, the q143/q171 contract), and the branch condition is an
    integer compare of ``s_fp`` against a Python-precomputed literal
    (:func:`_linear_count_threshold`), never a float test. The ``est``
    column is then the standard HLL estimator: linear counting when
    ``n_zero > 0`` and the raw estimate is under ``2.5 m``, raw
    otherwise. The accuracy invariant against exact distinct counts is
    pinned in tests (sigma ~ 1.04/sqrt(m) ~ 1.6% at p=12).

    Output: (*group_cols, m, n_zero, s_fp LONG, raw_est DOUBLE-exact
    [, est DOUBLE-exact when linear_counting]).
    """
    g = list(group_cols or [])
    _check_hll_p(p)
    m = 1 << int(p)
    big_r = 61 - int(p)
    term = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (F.lit(big_r) - F.col("rho"))
    )
    agg = registers.groupBy(*g).agg(
        F.count("*").alias("_present"),
        F.sum(term).alias("_s_present"),
    )
    n_zero = (F.lit(m) - F.col("_present")).alias("n_zero")
    s_fp = (
        F.col("_s_present")
        + (F.lit(m) - F.col("_present"))
        * F.lit(1 << big_r).cast("long")
    ).alias("s_fp")
    out = agg.select(*g, F.lit(m).alias("m"), n_zero, s_fp)
    raw = (F.lit(_hll_alpha_num(p)) / F.col("s_fp")).alias("raw_est")
    out = out.select(*g, "m", "n_zero", "s_fp", raw)
    if not linear_counting:
        return out
    from solar_data_tools_spark.operators.sampling import with_ln_fp6

    # ln over POSITIVE inputs only: n_zero = 0 rows never take the
    # linear-counting branch, so feed greatest(n_zero, 1) and let the
    # CASE route them to raw (same greatest() trick in the SQL mirror)
    lc = out.withColumn(
        "_nz_pos", F.greatest(F.col("n_zero"), F.lit(1)).cast("long")
    )
    lc = with_ln_fp6(lc, "_nz_pos", "_ln_nz")
    # m * (ln_fp6(m) - ln_fp6(n_zero)): LONG product, int->double
    # conversion, one IEEE division. The product stays under 2^53 (so
    # the conversion is EXACT) through p=28; at p=29/30 it can round —
    # still engine-portable (int64->double is correctly rounded in both
    # engines), but the est value is then correctly-rounded rather than
    # exact. ln_fp6(m) is a constant, inlined via the pure-Python
    # mirror.
    lin = (
        F.lit(m).cast("long")
        * (F.lit(_ln_fp6_int(m)).cast("long") - F.col("_ln_nz"))
    ).cast("double") / F.lit(1.0e6)
    est = (
        F.when(
            (F.col("n_zero") > 0)
            & (F.col("s_fp") >= F.lit(_linear_count_threshold(p))),
            lin,
        )
        .otherwise(F.col("raw_est"))
        .alias("est")
    )
    return lc.select(*g, "m", "n_zero", "s_fp", "raw_est", est)


def bloom_build(
    df: DataFrame,
    token_col: str = "token",
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    seed: int | str = 0,
) -> DataFrame:
    """Deterministic Bloom filter over a token set — the broadcastable
    membership sketch that replaces a corpus-vs-eval JOIN at 100 TB:
    instead of shuffling every training shingle against the eval set,
    build ``num_bits`` bits over the (small) eval side once and probe
    the big side with a broadcast map-side lookup. One-sided: a miss is
    a GUARANTEED non-member; a hit is a member with false-positive rate
    ~ (1 - e^(-k*n/m))^k (k hashes, n members, m bits).

    Engine-exact by the module convention: bit positions come from md5
    (``pos_i = md5_60(seed:i:token) % num_bits``), the bitmap is LONG
    words of 63 usable bits (``word = pos div 63``, ``bit = pos mod
    63`` — bit 63 stays clear so no word ever goes negative, keeping
    shifts/modulo engine-portable) OR-merged with the
    ``bit_or`` aggregate both engines provide — the filter table is
    hash-certifiable against a DuckDB replay (q172). Absent words are
    all-zero.

    The aggregate is bounded by ``ceil(num_bits/63)`` rows regardless of how
    many tokens flow in — the same fixed-key-space discipline as the
    CMS grid and HLL registers (and like them it is streaming-legal:
    bit_or over a fixed key space needs no watermark).

    Output: (word LONG, bits LONG), one row per word with >= 1 bit set.
    """
    k = int(num_hashes)
    rows = df.select(
        F.col(token_col),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"),
    )
    h = F.md5(
        F.concat(
            F.lit(f"{seed}:"),
            F.col("_i").cast("string"),
            F.lit(":"),
            F.col(token_col).cast("string"),
        )
    )
    pos = F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"),
        F.lit(int(num_bits)),
    )
    # 63 usable bits per LONG word: bit 63 would flip the sign, and
    # arithmetic-vs-logical right-shift of negatives is exactly the
    # kind of engine divergence this module bans — keeping the top bit
    # clear makes every word, shift, and modulo operate on positives
    word = F.call_function("div", pos, F.lit(63)).alias("word")
    bit = F.pmod(pos, F.lit(63))
    contrib = F.call_function(
        "shiftleft", F.lit(1).cast("long"), bit.cast("int")
    )
    return (
        rows.select(word, contrib.alias("_b"))
        .groupBy("word")
        .agg(F.bit_or("_b").alias("bits"))
    )


def bloom_probe(
    bloom: DataFrame,
    tokens: DataFrame,
    token_col: str = "token",
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    seed: int | str = 0,
) -> DataFrame:
    """Membership probe against a ``bloom_build`` filter: a token is
    ``maybe_member`` iff ALL ``num_hashes`` of its bits are set. The
    filter is at most ``ceil(num_bits/63)`` rows (~130 KiB of longs at the
    default 2^20 bits) and broadcasts; each probe token fans out to
    ``num_hashes`` (word, bit) lookups — map-side, no corpus shuffle.

    Same md5 positions as the builder, so probe results are engine-
    exact and the q172 oracle replays build AND probe.

    Output: (``token_col``, maybe_member BOOLEAN) — distinct tokens
    only (the probe groups on the token; join back for carry columns,
    the ``cms_estimate`` convention).
    """
    k = int(num_hashes)
    rows = tokens.select(
        F.col(token_col),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"),
    )
    h = F.md5(
        F.concat(
            F.lit(f"{seed}:"),
            F.col("_i").cast("string"),
            F.lit(":"),
            F.col(token_col).cast("string"),
        )
    )
    pos = F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"),
        F.lit(int(num_bits)),
    )
    probe = rows.select(
        F.col(token_col),
        F.call_function("div", pos, F.lit(63)).alias("word"),
        F.pmod(pos, F.lit(63)).alias("_bit"),
    )
    joined = probe.join(F.broadcast(bloom), "word", "left")
    hit = F.pmod(
        F.call_function(
            "shiftright",
            F.coalesce(F.col("bits"), F.lit(0).cast("long")),
            F.col("_bit").cast("int"),
        ),
        F.lit(2),
    )
    return (
        joined.groupBy(token_col)
        .agg((F.min(hit) == 1).alias("maybe_member"))
    )
