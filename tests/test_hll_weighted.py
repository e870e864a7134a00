"""Round-8 additions: engine-exact HyperLogLog and Gumbel-top-k
weighted sampling (the integer fixed-point machinery applied beyond
DSIR).

The oracle-parity suite pins both against DuckDB (q170/q171); these
tests pin the SEMANTICS — HLL accuracy and mergeability, weighted
sampling's proportionality and determinism — which no SQL replay can
certify.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from solar_data_tools_spark.operators import sketches as sk
from solar_data_tools_spark.operators.sampling import (
    weighted_sample_without_replacement,
    with_ln_fp6,
)


def _tokens(spark, n, prefix="tok"):
    return spark.range(n).select(
        F.concat(F.lit(f"{prefix}-"), F.col("id")).alias("token")
    )


def test_hll_estimate_within_error_bounds(spark):
    # sigma = 1.04 / sqrt(m); allow 4 sigma at p=10 (m=1024) -> 13%
    for true_n in (5_000, 40_000):
        regs = sk.hll_build(_tokens(spark, true_n), p=10)
        est = sk.hll_estimate(regs, p=10).collect()[0]["raw_est"]
        assert abs(est - true_n) / true_n < 4 * 1.04 / math.sqrt(1024), (
            true_n,
            est,
        )


def test_hll_linear_counting_from_emitted_n_zero(spark):
    # below 2.5*m the raw estimate is biased by design; the operator
    # deliberately emits n_zero instead of applying the ln-based
    # correction (libm ln is banned from certified columns) — verify
    # the caller-side correction m*ln(m/V) recovers the small range
    row = sk.hll_estimate(sk.hll_build(_tokens(spark, 500), p=10), p=10)
    r = row.collect()[0]
    assert r["raw_est"] > 2.5 * 1024 or r["n_zero"] > 0
    corrected = 1024 * math.log(1024 / r["n_zero"])
    assert abs(corrected - 500) / 500 < 4 * 1.04 / math.sqrt(1024), (
        corrected,
        r,
    )


def test_hll_registers_merge_by_max(spark):
    # union-then-build == build-then-merge(max): the mergeability that
    # makes the sketch shuffle-bounded at any scale
    a = _tokens(spark, 3_000, "a")
    b = _tokens(spark, 3_000, "b")
    both = sk.hll_build(a.union(b), p=10)
    merged = (
        sk.hll_build(a, p=10)
        .union(sk.hll_build(b, p=10))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    got = {(r["bucket"], r["rho"]) for r in both.collect()}
    want = {(r["bucket"], r["rho"]) for r in merged.collect()}
    assert got == want


def test_hll_registers_partitioning_invariant(spark):
    toks = _tokens(spark, 2_000)
    one = {
        (r["bucket"], r["rho"])
        for r in sk.hll_build(toks.coalesce(1), p=10).collect()
    }
    many = {
        (r["bucket"], r["rho"])
        for r in sk.hll_build(toks.repartition(16), p=10).collect()
    }
    assert one == many


def test_ln_fp6_matches_libm_within_tick_tolerance(spark):
    # the fixed-point ln is a DEFINED function (engine-exactness is the
    # contract, not libm equality) but it must track ln closely enough
    # to keep the sampler honest: < 1e-6 relative + series truncation
    xs = [1, 2, 3, 10, 999, 12345, 10**6, 10**9, 2**40, 2**62 - 1]
    df = spark.createDataFrame([(x,) for x in xs], "w long")
    got = {
        r["w"]: r["lnw"] / 1e6
        for r in with_ln_fp6(df, "w", "lnw").collect()
    }
    for x in xs:
        assert abs(got[x] - math.log(x)) < 5e-5, (x, got[x], math.log(x))


def test_ln_fp6_raises_on_nonpositive(spark):
    df = spark.createDataFrame([(0,)], "w long")
    with pytest.raises(Exception, match="non-positive"):
        with_ln_fp6(df, "w", "lnw").collect()


def test_weighted_sample_partitioning_invariant(spark):
    rows = [(i, (i % 7) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    pick = lambda d: [  # noqa: E731
        (r["doc_id"], r["rank"])
        for r in weighted_sample_without_replacement(
            d, k=50, weight_col="w", id_col="doc_id"
        ).collect()
    ]
    assert sorted(pick(df.coalesce(1))) == sorted(pick(df.repartition(16)))


def test_weighted_sample_is_proportional(spark):
    # two weight classes 1 vs 9: in a k=400-of-2000 draw the heavy
    # class (10% of rows, 50% of weight) must be strongly over-drawn;
    # the exact expectation needs without-replacement math, so assert
    # a generous corridor that a uniform sampler (40 +- noise) or a
    # weight-squared sampler would both miss
    rows = [(i, 9 if i % 10 == 0 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample_without_replacement(
        df, k=400, weight_col="w", id_col="doc_id"
    ).collect()
    heavy = sum(1 for r in got if r["w"] == 9)
    assert 90 < heavy < 200, heavy  # uniform would give ~40


def test_weighted_sample_rank_ordering(spark):
    rows = [(i, i + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample_without_replacement(
        df, k=10, weight_col="w", id_col="doc_id"
    ).collect()
    keys = [r["key_fp"] for r in sorted(got, key=lambda r: r["rank"])]
    assert keys == sorted(keys, reverse=True)
    assert len(got) == 10


def test_streaming_hll_matches_batch(spark, sf_small, tmp_path):
    """HLL registers are a bounded MAX aggregate: the streaming register
    table after ingesting the whole corpus equals hll_build's batch
    table exactly — watermark-free, state capped at |groups| * 2^p."""
    from solar_data_tools_spark.operators.dedup import word_ngrams
    from solar_data_tools_spark.session import read_table
    from solar_data_tools_spark.streaming import streaming_hll

    docs = read_table(spark, f"{sf_small}/documents.parquet").select(
        "source", "text"
    )
    src = str(tmp_path / "hll_stream")
    docs.write.parquet(src)
    stream = spark.readStream.schema("source string, text string").parquet(
        src
    )
    q = (
        streaming_hll(stream, n=3, p=10, group_cols=["source"], seed=0)
        .writeStream.format("memory")
        .queryName("hll_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["source"], r["bucket"], r["rho"])
        for r in spark.sql("select * from hll_stream_test").collect()
    }
    grams = word_ngrams(docs, n=3, id_col="source")
    batch = {
        (r["source"], r["bucket"], r["rho"])
        for r in sk.hll_build(
            grams, token_col="shingle", group_cols=["source"], p=10, seed=0
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """One-sidedness: every member probes true (NO false negatives,
    the property decontamination correctness rests on); non-members
    probe true only at the false-positive rate (~(1-e^(-kn/m))^k —
    generous 5x bound)."""
    members = _tokens(spark, 3_000, "in")
    others = _tokens(spark, 10_000, "out")
    bloom = sk.bloom_build(members, num_bits=1 << 18, num_hashes=4, seed=3)
    got_m = sk.bloom_probe(
        bloom, members, num_bits=1 << 18, num_hashes=4, seed=3
    ).collect()
    assert all(r["maybe_member"] for r in got_m)
    got_o = sk.bloom_probe(
        bloom, others, num_bits=1 << 18, num_hashes=4, seed=3
    ).collect()
    fp = sum(1 for r in got_o if r["maybe_member"]) / len(got_o)
    k, n, m = 4, 3_000, 1 << 18
    expected = (1.0 - math.exp(-k * n / m)) ** k
    assert fp <= 5 * expected + 1e-4, (fp, expected)


def test_bloom_words_stay_nonnegative(spark):
    """The 63-bit word contract: bit 63 never set, so shifts/modulo in
    the probe operate on positives in every engine."""
    bloom = sk.bloom_build(
        _tokens(spark, 5_000), num_bits=1 << 16, num_hashes=4, seed=1
    )
    bad = bloom.where(F.col("bits") < 0).count()
    assert bad == 0


def test_streaming_bloom_matches_batch(spark, sf_small, tmp_path):
    """Bloom words are a bounded bit_or aggregate: the streaming filter
    after ingesting the whole corpus equals bloom_build's batch words
    exactly — watermark-free, state capped at ceil(num_bits/63)."""
    from solar_data_tools_spark.operators.dedup import word_ngrams
    from solar_data_tools_spark.session import read_table
    from solar_data_tools_spark.streaming import streaming_bloom

    docs = read_table(spark, f"{sf_small}/documents.parquet").select(
        "text"
    )
    src = str(tmp_path / "bloom_stream")
    docs.write.parquet(src)
    stream = spark.readStream.schema("text string").parquet(src)
    q = (
        streaming_bloom(stream, n=8, num_bits=1 << 16, num_hashes=4, seed=5)
        .writeStream.format("memory")
        .queryName("bloom_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["word"], r["bits"])
        for r in spark.sql("select * from bloom_stream_test").collect()
    }
    docs_id = docs.withColumn("doc_id", F.lit(1))
    grams = word_ngrams(docs_id, n=8).select("shingle")
    batch = {
        (r["word"], r["bits"])
        for r in sk.bloom_build(
            grams, token_col="shingle", num_bits=1 << 16,
            num_hashes=4, seed=5,
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_ln_fp6_int_matches_spark_column(spark):
    """The pure-Python mirror used to inline ln_fp6(CONSTANT) literals
    (sketches._ln_fp6_int) must agree bit-for-bit with the Spark
    integer-ln column on a sweep of magnitudes — drift here would
    silently desync the q151 oracle's inlined ln_fp6(m)."""
    from solar_data_tools_spark.operators.sampling import with_ln_fp6
    from solar_data_tools_spark.operators.sketches import _ln_fp6_int

    xs = [1, 2, 3, 7, 64, 100, 1023, 1024, 1025, 12345,
          10**6, 2**31 - 1, 2**40 + 17, 2**62]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = {
        r["x"]: r["lnx"]
        for r in with_ln_fp6(df, "x", "lnx").collect()
    }
    for x in xs:
        assert got[x] == _ln_fp6_int(x), (x, got[x], _ln_fp6_int(x))


def test_hll_estimate_linear_counting_option(spark):
    """linear_counting=True: small cardinalities route through the
    integer-ln correction (est within the linear-counting error, far
    better than raw in this regime); n_zero=0 falls back to raw."""
    import math as _m

    row = sk.hll_estimate(
        sk.hll_build(_tokens(spark, 500), p=10), p=10,
        linear_counting=True,
    ).collect()[0]
    assert row["n_zero"] > 0
    expect = 1024 * _m.log(1024 / row["n_zero"])
    # integer fixed-point ln agrees with libm to ~1e-5 relative
    assert abs(row["est"] - expect) < 0.05
    assert abs(row["est"] - 500) / 500 < 4 * 1.04 / _m.sqrt(1024)


def test_hll_merge_equals_single_pass(spark):
    """Mergeability: sketches built on disjoint (and overlapping)
    slices, merged by hll_merge, must be BIT-IDENTICAL to the sketch
    built over the union in one pass — the property that lets per-dump
    register tables replace history rescans."""
    toks = _tokens(spark, 900)
    a = _tokens(spark, 600)
    b = spark.range(400, 900).select(  # overlaps a on [400, 600)
        F.concat(F.lit("tok-"), F.col("id")).alias("token")
    )
    merged = sk.hll_merge(
        sk.hll_build(a, p=10), sk.hll_build(b, p=10)
    )
    single = sk.hll_build(toks, p=10)
    rows = lambda df: sorted(  # noqa: E731
        (r["bucket"], r["rho"]) for r in df.collect()
    )
    assert rows(merged) == rows(single)
    est_m = sk.hll_estimate(merged, p=10, linear_counting=True).collect()[0]
    est_s = sk.hll_estimate(single, p=10, linear_counting=True).collect()[0]
    assert est_m["est"] == est_s["est"]
