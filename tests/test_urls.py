"""URL curation layer: canonicalization edge cases, keep-best dedup,
per-domain caps, and plan-shape (no Python in the hot path)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from solar_data_tools_spark.operators import urls as ur


def _canon(spark, raw: str) -> str:
    df = spark.createDataFrame([Row(url=raw)])
    return df.select(ur.canonicalize_url(F.col("url")).alias("c")).first()["c"]


def _domain(spark, raw: str) -> str:
    df = spark.createDataFrame([Row(url=raw)])
    return df.select(ur.registered_domain(F.col("url")).alias("d")).first()["d"]


def test_canonicalize_edge_cases(spark):
    # bare host, no path/query/fragment
    assert _canon(spark, "https://Example.COM") == "https://example.com"
    # root path collapses onto bare host
    assert _canon(spark, "https://example.com/") == "https://example.com"
    # non-default port survives
    assert (
        _canon(spark, "http://example.com:8080/a") == "http://example.com:8080/a"
    )
    # default port for the OTHER scheme survives
    assert (
        _canon(spark, "http://example.com:443/a") == "http://example.com:443/a"
    )
    # path case preserved, query sorted, fragment dropped
    assert (
        _canon(spark, "https://a.com/PaTh?z=1&y=2#frag")
        == "https://a.com/PaTh?y=2&z=1"
    )
    # all params tracking -> no '?'
    assert (
        _canon(spark, "https://a.com/x?utm_a=1&gclid=2") == "https://a.com/x"
    )
    # empty params from '&&' dropped
    assert _canon(spark, "https://a.com/x?&&b=1") == "https://a.com/x?b=1"
    # 'utm' without underscore is NOT a tracking prefix
    assert _canon(spark, "https://a.com/x?utma=1") == "https://a.com/x?utma=1"


def test_registered_domain_suffixes(spark):
    assert _domain(spark, "https://a.b.Example.com/x") == "example.com"
    assert _domain(spark, "https://www.example.co.uk/x") == "example.co.uk"
    assert _domain(spark, "https://cdn.shop.example.co.uk/") == "example.co.uk"
    # bare registrable domain passes through
    assert _domain(spark, "https://example.com") == "example.com"
    # two-label host that IS a public suffix pair: nothing to strip
    assert _domain(spark, "https://co.uk/") == "co.uk"
    # port never leaks into the domain
    assert _domain(spark, "https://a.example.com:8443/x") == "example.com"


def test_canonicalize_is_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) over a messy URL
    corpus (hypothesis-generated parts + handpicked edge cases) — the
    property that makes re-canonicalizing an already-ingested corpus a
    no-op, so incremental crawls can always canonicalize defensively.
    Corpus: 200 seeded-random messy URLs + handpicked edge cases."""
    import random

    rng = random.Random(7)
    alphabet = "abcXYZ019-._~%&=?#/:@ "

    def part():
        return "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 12))
        )

    urls = [
        f"https://{part() or 'x'}.com/{part()}?{part()}#{part()}"
        for _ in range(200)
    ] + [
        "https://WWW.Example.com/a/b/?utm_source=x&b=2&a=1#frag",
        "http://example.co.uk:80//double//slash/",
        "https://example.com/%7Euser/./path/../x",
        "ftp://odd.scheme.example/x",
        "not a url at all",
        "https://example.com/?",
    ]
    df = spark.createDataFrame([Row(url=u) for u in urls])
    out = df.select(
        ur.canonicalize_url(F.col("url")).alias("c1"),
    ).select(
        "c1", ur.canonicalize_url(F.col("c1")).alias("c2")
    )
    for r in out.collect():
        assert r["c1"] == r["c2"], r.asDict()


def test_url_dedup_keep_best_and_ties(spark):
    rows = [
        # same canonical URL, different quality -> max quality wins
        Row(doc_id=1, n_chars=10, url="https://www.a.com/p?utm_x=1"),
        Row(doc_id=2, n_chars=30, url="https://a.com/p/"),
        # quality tie -> smallest id wins
        Row(doc_id=5, n_chars=7, url="https://b.com/q"),
        Row(doc_id=4, n_chars=7, url="https://b.com/q#frag"),
    ]
    out = ur.url_dedup(spark.createDataFrame(rows)).orderBy("canon_url")
    got = [(r["canon_url"], r["n_dups"], r["doc_id"], r["n_chars"])
           for r in out.collect()]
    assert got == [
        ("https://a.com/p", 2, 2, 30),
        ("https://b.com/q", 2, 4, 7),
    ]


def test_url_dedup_string_ids(spark):
    """The tie-break must work for NON-numeric ids (WARC record ids,
    UUIDs): lexicographically smallest id wins on a quality tie."""
    rows = [
        Row(doc_id="warc-b", n_chars=7, url="https://b.com/q"),
        Row(doc_id="warc-a", n_chars=7, url="https://b.com/q#frag"),
        Row(doc_id="warc-z", n_chars=9, url="https://c.com/r"),
    ]
    out = ur.url_dedup(spark.createDataFrame(rows)).orderBy("canon_url")
    got = [(r["canon_url"], r["n_dups"], r["doc_id"], r["n_chars"])
           for r in out.collect()]
    assert got == [
        ("https://b.com/q", 2, "warc-a", 7),
        ("https://c.com/r", 1, "warc-z", 9),
    ]


def test_domain_cap_small_cap_prefilter_warns(spark):
    """cap=20, margin=2 puts the Chernoff divergence bound at
    exp(-2.5) ≈ 8% per over-cap domain — the prefilter must warn that
    the 'identical to exact' guarantee is weak at this setting."""
    import warnings as _warnings

    rows = [Row(doc_id=i, url=f"https://big.com/p{i}") for i in range(50)]
    df = spark.createDataFrame(rows)
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        ur.domain_cap(df, cap=20, seed=9, prefilter_margin=2.0).collect()
    assert any("divergence bound" in str(w.message) for w in caught)
    # a healthy setting (cap=1000, margin=2 → exp(-125)) must NOT warn
    with _warnings.catch_warnings(record=True) as caught2:
        _warnings.simplefilter("always")
        ur.domain_cap(df, cap=1000, seed=9, prefilter_margin=2.0).collect()
    assert not any("divergence bound" in str(w.message) for w in caught2)


def test_domain_cap_exact_k_and_determinism(spark):
    rows = [
        Row(doc_id=i, url=f"https://s{i % 4}.dom{i % 3}.com/{i}")
        for i in range(90)
    ]
    df = spark.createDataFrame(rows)
    out = ur.domain_cap(df, cap=5, seed=3)
    counts = {r["domain"]: r["n"] for r in
              out.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert counts == {"dom0.com": 5, "dom1.com": 5, "dom2.com": 5}
    # partitioning-invariant: same survivors from a repartitioned input
    kept1 = sorted(r["doc_id"] for r in out.collect())
    kept2 = sorted(
        r["doc_id"]
        for r in ur.domain_cap(df.repartition(7), cap=5, seed=3).collect()
    )
    assert kept1 == kept2
    # under-cap domains keep everything
    small = ur.domain_cap(df.where(F.col("doc_id") < 3), cap=5, seed=3)
    assert small.count() == 3


def test_canonicalize_is_codegen_only(spark):
    """The canonicalization/domain path must stay JVM-side: no
    BatchEvalPython / ArrowEvalPython stage in the physical plan."""
    df = spark.createDataFrame([Row(url="https://a.com/x?b=1")])
    out = df.select(
        ur.canonicalize_url(F.col("url")).alias("c"),
        ur.registered_domain(F.col("url")).alias("d"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_domain_cap_prefilter_equals_exact(spark):
    """The mega-domain prefilter path must return EXACTLY the same rows
    as the plain path (margin keeps a superset of the hash-smallest cap
    rows), on a skewed corpus where one domain holds 80% of rows."""
    rows = [
        Row(doc_id=i,
            url=f"https://www.big.com/{i}" if i < 800
            else f"https://s.small{i % 5}.org/{i}")
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows)
    exact = ur.domain_cap(df, cap=20, seed=9)
    fast = ur.domain_cap(df, cap=20, seed=9, prefilter_margin=2.0)
    a = sorted((r["doc_id"], r["domain"]) for r in exact.collect())
    b = sorted((r["doc_id"], r["domain"]) for r in fast.collect())
    assert a == b
    # under-cap domains are untouched by the prefilter
    doms = {d for _, d in b}
    assert {"big.com"} | {f"small{k}.org" for k in range(5)} == doms


def test_domain_cap_prefilter_plan_shape(spark):
    """The prefilter must not add a second shuffle of the big side: at
    most two hash exchanges total (the corpus by domain + the tiny
    count aggregate; AQE broadcasts the count side at this scale), and
    Spark's rank-limit pushdown (WindowGroupLimit) must survive, so the
    per-domain sort is a top-k heap, not a full sort."""
    rows = [Row(doc_id=i, url=f"https://d{i % 3}.com/{i}") for i in range(60)]
    out = ur.domain_cap(spark.createDataFrame(rows), cap=5,
                        prefilter_margin=2.0)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan.toString() prints the final plan AND the initial
    # plan; count shuffles only in the executed (final) section
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") <= 2
    assert "WindowGroupLimit" in final


def test_streaming_url_dedup_matches_batch_contract(spark, sf_small, tmp_path):
    """Ingest-time canonical-URL dedup keeps exactly one record per
    canonical URL, even though raw URLs differ by tracking params /
    www. / trailing slashes."""
    from solar_data_tools_spark.session import read_table
    from solar_data_tools_spark.streaming import streaming_url_dedup

    docs = read_table(spark, f"{sf_small}/documents.parquet").select(
        "doc_id", "source"
    )
    staged = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
            F.col("source"), F.lit(".example.com/page/"),
            (F.col("doc_id") % 50).cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 2 == 1, F.lit("?utm_campaign=x")).otherwise(
                F.lit("")
            ),
        ).alias("url"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)"
        ).alias("ingest_ts"),
    )
    src = str(tmp_path / "url_stream")
    staged.write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, url string, ingest_ts timestamp")
        .parquet(src)
    )
    q = (
        streaming_url_dedup(stream)
        .writeStream.format("memory")
        .queryName("url_dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = spark.sql(
        "select doc_id from url_dedup_stream_test"
    ).toPandas()["doc_id"]

    # contract: exactly ONE survivor per canonical-URL group (within a
    # microbatch the survivor is processing-order-arbitrary, so assert
    # group membership, not a specific doc_id)
    groups = {
        r["doc_id"]: r["c"]
        for r in staged.withColumn(
            "c", ur.canonicalize_url(F.col("url"))
        ).select("doc_id", "c").collect()
    }
    kept_groups = [groups[d] for d in kept]
    assert len(kept_groups) == len(set(kept_groups))  # one per group
    assert set(kept_groups) == set(groups.values())  # every group kept


def test_canonicalize_fragment_and_unparseable(spark):
    # '?' inside the fragment is NOT a query string
    assert _canon(spark, "https://a.com/x#sec?b=1") == "https://a.com/x"
    assert (
        _canon(spark, "https://app.com/#/users?id=5") == "https://app.com"
    )
    # scheme-less URLs pass through unchanged (never collapse to '://')
    assert _canon(spark, "//a.com/x") == "//a.com/x"
    assert _canon(spark, "not a url") == "not a url"
    # ... and each stays its own domain group
    assert _domain(spark, "//a.com/x") == "//a.com/x"
    # IPv4 literals pass through whole, never last-two-octet merged
    assert _domain(spark, "http://192.168.0.1/a") == "192.168.0.1"
    assert _domain(spark, "http://10.77.0.1:8080/b") == "10.77.0.1"


def test_blocklist_match_modes(spark):
    """Exact host, subdomain-of-blocked, registrable-suffix, www-strip,
    and a near-miss (blocked domain as a LABEL PREFIX, not a suffix)
    must each resolve correctly."""
    rows = [
        Row(doc_id=0, url="https://bad.example.com/x"),      # exact
        Row(doc_id=1, url="https://cdn.bad.example.com/x"),  # subdomain
        Row(doc_id=2, url="https://WWW.bad.example.com/x"),  # www-strip
        Row(doc_id=3, url="https://good.example.com/x"),     # clean
        Row(doc_id=4, url="https://notbad.example.com/x"),   # prefix trap
        Row(doc_id=5, url="https://anything.evil.net/x"),    # suffix tld+1
        Row(doc_id=6, url="https://evil.net.example.com/x"), # infix trap
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["doc_id"]: r["blocked"]
        for r in ur.blocklist_mark(
            df, ["bad.example.com", "evil.net"]
        ).collect()
    }
    assert got == {0: True, 1: True, 2: True, 3: False, 4: False,
                   5: True, 6: False}


def test_blocklist_filter_join_matches_literal(spark):
    bl = ["s3.example.com", "spam.org"]
    rows = [
        Row(doc_id=i,
            url=f"https://s{i % 7}.example.com/{i}" if i % 2 == 0
            else f"https://p{i}.spam.org/{i}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    lit_kept = sorted(
        r["doc_id"] for r in ur.blocklist_filter(df, bl).collect()
    )
    bldf = spark.createDataFrame([Row(domain=d) for d in bl])
    join_kept = sorted(
        r["doc_id"]
        for r in ur.blocklist_filter_join(df, bldf).collect()
    )
    assert lit_kept == join_kept
    assert all(i % 2 == 0 and i % 7 != 3 for i in lit_kept)


def test_blocklist_mark_is_codegen_only(spark):
    df = spark.createDataFrame([Row(url="https://a.b.com/x")])
    out = ur.blocklist_mark(df, ["b.com"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_blocklist_empty_list_raises(spark):
    df = spark.createDataFrame([Row(url="https://a.b.com/x")])
    with pytest.raises(ValueError):
        ur.blocklist_mark(df, [])


def test_streaming_blocklist_matches_batch(spark, tmp_path):
    """blocklist_mark is a stateless codegen projection — it gates URLs
    at INGEST time under Structured Streaming: availableNow file stream
    == batch, no watermark state."""
    rows = [
        Row(doc_id=i,
            url=f"https://s{i % 5}.example.com/{i}" if i % 2 == 0
            else f"https://x{i}.blocked.org/{i}")
        for i in range(80)
    ]
    df = spark.createDataFrame(rows)
    src = str(tmp_path / "bl_src")
    df.write.parquet(src)
    bl = ["s3.example.com", "blocked.org"]
    stream = spark.readStream.schema("doc_id long, url string").parquet(src)
    q = (
        ur.blocklist_mark(stream, bl)
        .writeStream.format("memory")
        .queryName("bl_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: r["blocked"]
        for r in spark.sql("select * from bl_stream_test").collect()
    }
    batch = {
        r["doc_id"]: r["blocked"]
        for r in ur.blocklist_mark(df, bl).collect()
    }
    assert streamed == batch and len(batch) == 80
    assert any(batch.values()) and not all(batch.values())
