"""Tick-margin audit for certified TRANSCENDENTAL projections.

The round-8/9 determinism work made every certified aggregate an
integer tick sum and every rounding the portable floor pattern — fully
layout-independent, and engine-exact for +-*/ arithmetic (IEEE ops are
bit-identical given identical operands). The one residual cross-engine
risk class is transcendental INPUTS: Spark (JVM StrictMath-accurate,
<=1 ulp) and DuckDB (C libm) may return doubles a ulp apart for the
same argument of cos/sin/exp/..., and a per-term quantization
``floor(v * 10^d + 0.5)`` flips by one tick iff ``v`` lands within that
ulp of a tick boundary.

This audit makes the risk EMPIRICAL for the driver's gate data: for
every certified projection that feeds a transcendental into
``ticks``/``pround`` at digits=6, compute the distance of
``v * 1e6 + 0.5`` to its nearest integer boundary over ALL rows at
sf0.01 (the external gate's scale) and assert the minimum margin is
>= 1e-7 — three-plus orders of magnitude above the ~1e-10 scaled-ulp
divergence libm implementations can exhibit for |v| <= 100. A failure
here means a certified query is one unlucky libm ulp away from a
driver red and must move to a coarser digit or a rational
reformulation (it does NOT mean the current gate is red — the parity
suite checks that directly)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solar_data_tools_spark.functions import solar as sol
from solar_data_tools_spark.session import read_table

MIN_MARGIN = 1e-7
DIGITS = 6


def _min_margin(df, col):
    """Min distance of col*10^d + 0.5 to the nearest integer boundary."""
    x = col * F.lit(float(10**DIGITS)) + F.lit(0.5)
    frac = x - F.floor(x)
    margin = F.least(frac, F.lit(1.0) - frac)
    return df.agg(F.min(margin).alias("m")).collect()[0]["m"]


@pytest.fixture(scope="module")
def sf_gate():
    return "/root/testdata/sf0.01"


def test_q32_cos_sin_term_margins(spark, sf_gate):
    """q32's certified tick terms: cos/sin of the event time-of-day
    angle (registry.py::q32_rayleigh)."""
    ev = read_table(spark, f"{sf_gate}/events.parquet")
    angle = (
        (F.floor(F.unix_micros("ts") / 1_000_000) % 86400)
        / 86400.0
        * 2.0
        * 3.141592653589793
    )
    a = ev.select(angle.alias("angle"))
    for name, term in (("cos", F.cos("angle")), ("sin", F.sin("angle"))):
        m = _min_margin(a, term)
        assert m >= MIN_MARGIN, f"q32 {name} margin {m}"


def test_q33_solar_function_margins(spark, sf_gate):
    """q33's certified per-row projections: equation-of-time (two
    flavours), Cooper declination, daylight hours — all sin/cos
    compositions over day-of-year."""
    li = read_table(spark, f"{sf_gate}/lineitem.parquet")
    doys = li.select(F.dayofyear("l_shipdate").alias("doy")).distinct()
    exprs = {
        "eot_duffie": sol.eot_duffie(F.col("doy")),
        "eot_da_rosa": sol.eot_da_rosa(F.col("doy")),
        "delta_cooper": sol.delta_cooper(F.col("doy")),
        "daylight_hours": sol.num_daylight_hours(
            37.45, sol.delta_cooper(F.col("doy"))
        ),
    }
    for name, e in exprs.items():
        m = _min_margin(doys, e)
        assert m >= MIN_MARGIN, f"q33 {name} margin {m}"


def test_q70_cos_theta_margin(spark, sf_gate):
    """q70's certified cos-theta geometry projection (F5/F6/F9)."""
    li = read_table(spark, f"{sf_gate}/lineitem.parquet")
    doys = li.select(F.dayofyear("l_shipdate").alias("doy")).distinct()
    delta = sol.delta_cooper(F.col("doy"))
    hours = doys.crossJoin(
        spark.range(6, 19).select(
            (F.col("id").cast("double") - 12.0).alias("solar_hour")
        )
    )
    omega = sol.hour_angle(F.col("solar_hour"))
    ct = sol.cos_theta(
        delta, omega, lat_deg=37.45, tilt_deg=20.0, azimuth_deg=0.0
    )
    m = _min_margin(hours, ct)
    assert m >= MIN_MARGIN, f"q70 cos_theta margin {m}"


# ---------------------------------------------------------------------------
# Round 10 (r9 verdict items "What's wrong #1" + "Next #5"): the audit
# is now STRUCTURAL — tests/test_certification_lint.py walks every
# certified query (depth-3 into package helpers) for libm-backed
# transcendentals (sin/cos/tan/asin/acos/atan/atan2/exp/log*/pow/...;
# IEEE-correctly-rounded sqrt is exempt) and requires each hit to be
# listed here WITH a measuring probe below. A new solar-geometry or
# classifier query cannot silently skip the audit.
# ---------------------------------------------------------------------------

# every certified query whose hash rides a transcendental-derived value,
# each covered by a probe in this file (the lint cross-checks both
# directions: no unaudited query, no stale entry)
MARGIN_AUDITED = {
    "q32_rayleigh",
    "q33_solar_geometry",
    "q70_cos_theta_geometry",
    "q11_daily_stats",
    "q34_longitude_estimate",
    "q35_latitude_estimate",
    "q103_unigram_logprob",
    "q115_bigram_logprob",
    "q113_tfidf_terms",
    "q132_latitude_study",
    "q135_longitude_study_closed",
    "q136_ground_truth_tilt_azimuth",
    "q138_classifier_score",
    "q140_crawl_curation_pipeline",
    "q147_quality_pyramid",
    "q155_corpus_report",
    "q156_curation_pipeline_v2",
    "q150_temperature_sample",
    "q152_weighted_shuffle",
    "q71_declination_binned_mean",
    "q143_dsir_selection",
    "q162_bm25_topk",
    # q164's only transcendental is bm25's idf (dense leg is cosine =
    # dot/sqrt, both engine-exact); covered by the q162 probe
    "q164_hybrid_rrf",
    "q169_fleet_relational_spine",
}


def _min_margin_d(df, col, digits):
    x = col * F.lit(float(10**digits)) + F.lit(0.5)
    frac = x - F.floor(x)
    margin = F.least(frac, F.lit(1.0) - frac)
    return df.agg(F.min(margin).alias("m")).collect()[0]["m"]


def _docs(spark, sf_gate):
    return read_table(spark, f"{sf_gate}/documents.parquet")


def test_q11_log_day_max_margin(spark, sf_gate):
    """q11's log_day_max = ln(max(value)) per (site, date) at 1e6."""
    from solar_data_tools_spark.operators.canonical import (
        events_as_measurements,
    )

    m = events_as_measurements(
        read_table(spark, f"{sf_gate}/events.parquet")
    )
    daily = m.groupBy("site", "date").agg(
        F.log(F.max("value")).alias("lm")
    )
    mg = _min_margin(daily, F.col("lm"))
    assert mg >= MIN_MARGIN, f"q11 log_day_max margin {mg}"


def test_q34_q35_median_margins(spark, sf_gate):
    """q34/q35 hash per-site MEDIANS of transcendental-derived daily
    estimates (eot-corrected longitude; atan/tan latitude) at 1e6 —
    measure the margin of the hashed median itself."""
    from solar_data_tools_spark.operators import daily as dy
    from solar_data_tools_spark.operators.canonical import (
        events_as_measurements,
    )

    m = events_as_measurements(
        read_table(spark, f"{sf_gate}/events.parquet")
    )
    # q34 replica minus the final rounding
    def _psum(col, d=6):
        if isinstance(col, str):
            col = F.col(col)
        return F.sum(
            F.floor(col * F.lit(float(10**d)) + F.lit(0.5)).cast("long")
        ) / F.lit(float(10**d))

    noon = m.groupBy("site", "date").agg(
        (_psum(F.col("hod") * F.col("value")) / _psum("value") * 60.0)
        .alias("noon_min")
    )
    doy = F.dayofyear("date")
    lon = noon.select(
        "site",
        sol.calc_lon(
            F.col("noon_min"), sol.eot_duffie(doy), gmt_offset=0.0
        ).alias("v"),
    ).groupBy("site").agg(F.expr("percentile(v, 0.5)").alias("med"))
    mg = _min_margin(lon, F.col("med"))
    assert mg >= MIN_MARGIN, f"q34 longitude median margin {mg}"

    cap = dy.site_capacity(m)
    j = m.join(F.broadcast(cap), "site")
    v = F.col("value")
    thresh = 0.05 * F.col("capacity")
    daylight = j.groupBy("site", "date").agg(
        (
            F.max(F.when(v > thresh, F.col("hod")))
            - F.min(F.when(v > thresh, F.col("hod")))
        ).alias("hours_daylight")
    )
    lat = daylight.where(F.col("hours_daylight") > 0).select(
        "site",
        sol.calc_lat(
            F.col("hours_daylight"),
            sol.delta_cooper(F.dayofyear("date")),
        ).alias("v"),
    ).groupBy("site").agg(F.expr("percentile(v, 0.5)").alias("med"))
    mg = _min_margin(lat, F.col("med"))
    assert mg >= MIN_MARGIN, f"q35 latitude median margin {mg}"


def test_q103_q115_logprob_fp_margins(spark, sf_gate):
    """q103/q115 quantize per-token/-bigram ln probabilities to LONG at
    1e6 inside the vocabulary tables — the margin point is the raw ln
    before its floor."""
    import inspect as _i

    from solar_data_tools_spark.operators.curation import bigram_logprob
    from solar_data_tools_spark.operators.dedup import normalize_text

    docs = _docs(spark, sf_gate)
    tok = docs.select(
        "doc_id",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias(
            "tok"
        ),
    ).where(F.length("tok") > 0)
    vocab = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    uni = vocab.crossJoin(F.broadcast(total)).select(
        F.log(F.col("cnt") / F.col("total")).alias("lp")
    )
    mg = _min_margin(uni, F.col("lp"))
    assert mg >= MIN_MARGIN, f"q103 unigram logp margin {mg}"

    alpha = _i.signature(bigram_logprob).parameters["alpha"].default
    toks = docs.select(
        "doc_id",
        F.split(normalize_text(F.col("text")), " ").alias("_t"),
    ).where(F.size("_t") >= 2)
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(_t) - 1), "
                "i -> struct(_t[i-1] AS w1, _t[i] AS w2))"
            )
        ).alias("_bg")
    ).select(F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("cbg"))
    ctx = counts.groupBy("w1").agg(F.sum("cbg").alias("cctx"))
    vocab_n = toks.select(F.explode("_t").alias("tok")).where(
        F.length("tok") > 0
    ).agg(F.countDistinct("tok").alias("v"))
    bi = counts.join(ctx, "w1").crossJoin(F.broadcast(vocab_n)).select(
        F.log(
            (F.col("cbg") + F.lit(alpha))
            / (F.col("cctx") + F.lit(alpha) * F.col("v"))
        ).alias("lp")
    )
    mg = _min_margin(bi, F.col("lp"))
    assert mg >= MIN_MARGIN, f"q115 bigram logp margin {mg}"


def test_q113_tfidf_score_margin(spark, sf_gate):
    """q113 hashes the top-5 TF-IDF scores per doc (ln-based idf) at
    1e6 — margin over exactly the hashed rows."""
    from solar_data_tools_spark.operators.curation import tfidf_top_terms

    out = tfidf_top_terms(_docs(spark, sf_gate), k=5)
    mg = _min_margin(out, F.col("score"))
    assert mg >= MIN_MARGIN, f"q113 tfidf score margin {mg}"


def test_q132_q135_study_margins(spark, sf_gate):
    """The profiler study sweeps hash per-configuration lat/lon at 1e4
    — trig-inversion outputs; margins measured at the hashed digits."""
    from solar_data_tools_spark.algorithms.profiler_studies import (
        latitude_study,
        longitude_study,
    )
    from solar_data_tools_spark.operators.canonical import (
        events_as_measurements,
    )

    m = events_as_measurements(
        read_table(spark, f"{sf_gate}/events.parquet")
    )
    lat = latitude_study(m)
    mg = _min_margin_d(lat, F.col("latitude"), 4)
    assert mg >= MIN_MARGIN, f"q132 latitude margin {mg}"
    lon = longitude_study(
        m, gmt_offset=0.0,
        estimators=("calculated", "fit_l1", "fit_l2"), exact_digits=6,
    )
    # fit_l2's mean is a POST-quantization exact rational (tick_avg at
    # 1e6) — its 1e4 margin is legitimately 0 sometimes and carries no
    # cross-engine risk (both engines round the identical double); the
    # transcendental margin for that leg is the daily-lon 1e6
    # quantization measured below. The median legs hash raw
    # transcendental-derived doubles, so their 1e4 margin is the one
    # that matters.
    med = lon.where(F.col("estimator") != "fit_l2")
    mg = _min_margin_d(med, F.col("longitude"), 4)
    assert mg >= MIN_MARGIN, f"q135 median-leg longitude margin {mg}"

    def _psum(col, d=6):
        if isinstance(col, str):
            col = F.col(col)
        return F.sum(
            F.floor(col * F.lit(float(10**d)) + F.lit(0.5)).cast("long")
        ) / F.lit(float(10**d))

    noon = m.groupBy("site", "date").agg(
        (_psum(F.col("hod") * F.col("value")) / _psum("value") * 60.0)
        .alias("noon_min")
    )
    doy = F.dayofyear("date")
    for name, eot in (
        ("duffie", sol.eot_duffie(doy)),
        ("da_rosa", sol.eot_da_rosa(doy)),
    ):
        daily = noon.select(
            sol.calc_lon(F.col("noon_min"), eot, gmt_offset=0.0).alias(
                "v"
            )
        )
        mg = _min_margin(daily, F.col("v"))
        assert mg >= MIN_MARGIN, f"q135 fit_l2 daily-lon({name}) {mg}"


def test_q136_ground_truth_margins(spark, sf_gate):
    """q136: per-polygon tilt/azimuth (atan2 outputs) quantize at 1e6
    inside the tick moments; the final stats round at 1e4."""
    from solar_data_tools_spark.algorithms.ground_truth import (
        ground_truth_tilt_azimuth,
        polygon_tilt_azimuth,
    )

    emb = read_table(spark, f"{sf_gate}/embeddings.parquet")
    e = lambda i: F.element_at("embedding", i).cast("double")  # noqa: E731
    polys = emb.select(
        (F.col("vec_id") % 50).alias("home_id"),
        (F.lit(-120.0) + e(1) * 0.001).alias("lon1"),
        (F.lit(35.0) + e(2) * 0.001).alias("lat1"),
        (e(3) * 10.0).alias("alt1"),
        (F.lit(-120.0) + e(4) * 0.001).alias("lon2"),
        (F.lit(35.0) + e(5) * 0.001).alias("lat2"),
        (e(6) * 10.0).alias("alt2"),
        (F.lit(-120.0) + e(7) * 0.001).alias("lon3"),
        (F.lit(35.0) + e(8) * 0.001).alias("lat3"),
        (e(9) * 10.0).alias("alt3"),
    )
    pp = polygon_tilt_azimuth(polys)
    for c in ("tilt_deg", "azimuth_deg"):
        mg = _min_margin(pp, F.col(c))
        assert mg >= MIN_MARGIN, f"q136 {c} margin {mg}"
        mg = _min_margin(pp, F.col(c) * F.col(c))
        assert mg >= MIN_MARGIN, f"q136 {c}^2 margin {mg}"
    stats = ground_truth_tilt_azimuth(polys, exact_digits=6)
    for c in ("ave_tilt", "med_tilt", "std_tilt", "ave_azimuth",
              "med_azimuth", "std_azimuth"):
        mg = _min_margin_d(stats, F.col(c), 4)
        assert mg >= MIN_MARGIN, f"q136 {c} margin {mg}"


def test_classifier_prob_margin(spark, sf_gate):
    """The fastText-style sigmoid prob rides the hash (q138) and every
    downstream keep/bucket decision (q140/q147/q155/q156) through ONE
    quantization: floor(prob * 1e6 + 0.5) — measured here over the
    exact gate configuration (d=4096, bias=-0.1, 'w13' weights)."""
    from solar_data_tools_spark.operators.curation import (
        linear_classifier_score,
    )
    from solar_data_tools_spark.operators.sampling import hash_uniform

    docs = _docs(spark, sf_gate)
    d = 4096
    weights = spark.range(d).select(
        F.col("id").alias("feature_id"),
        (hash_uniform(F.col("id"), "w13") * 2.0 - 1.0).alias("weight"),
    )
    out = linear_classifier_score(
        docs, weights, bias=-0.1, n_features=d, seed=0, exact_digits=6
    )
    mg = _min_margin(out, F.col("prob"))
    assert mg >= MIN_MARGIN, f"classifier prob margin {mg}"


def test_q150_temperature_rate_margin(spark, sf_gate):
    """q150/q156 quantize pow(c/c_min, alpha-1) per language at 1e6;
    the kept-set decision is downstream of exactly this rounding."""
    docs = _docs(spark, sf_gate)
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    cmin = counts.agg(F.min("c").alias("cm"))
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        F.pow(
            F.col("c").cast("double") / F.col("cm"), F.lit(0.3 - 1.0)
        ).alias("rate")
    )
    mg = _min_margin(rates, F.col("rate"))
    assert mg >= MIN_MARGIN, f"q150 rate margin {mg}"


def test_q152_weighted_key_margin(spark, sf_gate):
    """q152's permutation key pow(u, 1/w) quantizes at 1e6 — the whole
    certified ORDER depends on this rounding."""
    from solar_data_tools_spark.operators.sampling import hash_uniform

    docs = _docs(spark, sf_gate)
    weights = {"src0": 3.0, "src1": 0.5, "src7": 2.0}
    w = F.coalesce(
        *[
            F.when(F.col("source") == k, F.lit(v))
            for k, v in weights.items()
        ],
        F.lit(1.0),
    )
    u = hash_uniform(F.col("doc_id"), "mix5")
    u = F.least(F.greatest(u, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    keys = docs.select(F.pow(u, F.lit(1.0) / w).alias("key"))
    mg = _min_margin(keys, F.col("key"))
    assert mg >= MIN_MARGIN, f"q152 key margin {mg}"


def test_q71_declination_bin_margin(spark, sf_gate):
    """q71 BINS on pround(delta_cooper/2, 0)*2 — the margin point is
    delta/2 against integer boundaries (digits 0) over the gate's
    day-of-year domain."""
    ev = read_table(spark, f"{sf_gate}/events.parquet")
    doys = ev.select(F.dayofyear(F.to_date("ts")).alias("doy")).distinct()
    half = sol.delta_cooper(F.col("doy")) / 2.0
    mg = _min_margin_d(doys, half, 0)
    assert mg >= MIN_MARGIN, f"q71 declination bin margin {mg}"


def test_q143_dsir_log_ratio_margin(spark, sf_gate):
    """q143's only transcendental: the per-feature log-likelihood
    ratio, quantized ONCE to 1e-6-tick LONGs in the model table
    (everything downstream is integer). Margin of the raw 4-log
    expression at the gate configuration (n_features=2048, alpha=0.5,
    target = lang='en')."""
    from solar_data_tools_spark.operators.curation import (
        hashed_ngram_features,
    )

    docs = _docs(spark, sf_gate)
    target = docs.where(F.col("lang") == "en")
    n_features, alpha = 2048, 0.5
    feats = hashed_ngram_features(docs, n_features, "doc_id", "text", True, 0)
    tfeats = hashed_ngram_features(
        target, n_features, "doc_id", "text", True, 0
    )
    raw_counts = feats.groupBy("feature_id").agg(F.sum("cnt").alias("_cr"))
    tgt_counts = tfeats.groupBy("feature_id").agg(F.sum("cnt").alias("_ct"))
    raw_total = raw_counts.agg(F.sum("_cr").alias("_tr"))
    tgt_total = tgt_counts.agg(F.sum("_ct").alias("_tt"))
    a = F.lit(alpha)
    an = F.lit(alpha * n_features)
    lr = (
        F.log(F.coalesce(F.col("_ct"), F.lit(0)) + a)
        - F.log(F.col("_tt") + an)
        - F.log(F.col("_cr") + a)
        + F.log(F.col("_tr") + an)
    )
    tbl = (
        raw_counts.join(tgt_counts, "feature_id", "left")
        .crossJoin(F.broadcast(raw_total))
        .crossJoin(F.broadcast(tgt_total))
        .select(lr.alias("lr"))
    )
    mg = _min_margin(tbl, F.col("lr"))
    assert mg >= MIN_MARGIN, f"q143 dsir log-ratio margin {mg}"


def test_q162_bm25_contribution_margin(spark, sf_gate):
    """q162/q164: BM25's ln-idf rides ONE quantization — the per-term
    contribution floor(contrib * 1e6 + 0.5); the per-(query, doc)
    score is then an integer sum (exact rank order, exact hash).
    Margin of the raw contribution over the full postings table."""
    from solar_data_tools_spark.operators.dedup import normalize_text

    docs = _docs(spark, sf_gate)
    k1, b = 1.5, 0.75
    tok = docs.select(
        "doc_id",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias(
            "term"
        ),
    ).where(F.length("term") > 0)
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    contrib = (
        idf
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    tbl = (
        tf.join(df_t, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(contrib.alias("c"))
    )
    mg = _min_margin(tbl, F.col("c"))
    assert mg >= MIN_MARGIN, f"q162 bm25 contribution margin {mg}"


def test_q169_log_day_max_margin(spark, sf_gate):
    """q169's spine carries daily_statistics' log_day_max — same
    ln(max(value)) expression as q11, measured over the
    daily_statistics output itself."""
    from solar_data_tools_spark.operators.canonical import (
        events_as_measurements,
    )
    from solar_data_tools_spark.operators.daily import daily_statistics

    m = events_as_measurements(
        read_table(spark, f"{sf_gate}/events.parquet")
    )
    ds = daily_statistics(m)
    mg = _min_margin(ds, F.col("log_day_max"))
    assert mg >= MIN_MARGIN, f"q169 log_day_max margin {mg}"


def test_q169_tz_and_clip_decision_margins(spark, sf_gate):
    """Round-11 spine legs ride three DECISION boundaries (not tick
    boundaries): the tz offset's floor(12 - avg_noon + 0.5), the
    clipped-day indicator's cs1 > 0.05 / cs2 > 0.1, and the sunrise
    threshold value > 0.05*capacity where capacity is the interpolated
    percentile (the one value the two engines compute with different
    instruction orders). A flip needs the compared value to sit within
    ~1 ulp of the boundary; this probe measures the actual distance at
    the gate scale and requires >= 1e-9 — orders above ulp drift.

    The tz offset's floor(12 - avg_noon + 0.5) is deliberately NOT
    margin-asserted: avg_noon is a post-quantization rational (integer
    tick sum / 1e6 / count — every op IEEE-exact with identical
    operands on both engines), so even an exactly-integer boundary
    (measured: margin 0.0 at sf0.01, e.g. a site whose mean noon is
    exactly 11.5) floors identically on both engines — the riskless
    0-margin class documented in this module's convention. The risk
    all lives in the SELECTIONS feeding it, asserted below."""
    from pyspark.sql import functions as F

    from solar_data_tools_spark.operators.daily import clipping_stats
    from solar_data_tools_spark.plans.pipeline import run_pipeline
    from solar_data_tools_spark.session import read_table
    from solar_data_tools_spark.operators.canonical import (
        events_as_measurements,
    )

    m = events_as_measurements(read_table(spark, f"{sf_gate}/events.parquet"))
    core = run_pipeline(m.select("site", "ts", "seq", "value"), per_site=True)
    std = core.standardized
    cap = std.groupBy("site").agg(
        F.expr("percentile(value, 0.95)").alias("capacity")
    )
    j = std.join(F.broadcast(cap), "site")
    # sunrise threshold margin, relative to capacity scale
    thr = j.where(F.col("value").isNotNull()).agg(
        F.min(
            F.abs(F.col("value") - 0.05 * F.col("capacity"))
            / F.col("capacity")
        ).alias("m")
    ).collect()[0]["m"]
    assert thr >= 1e-9, f"sun-threshold margin {thr}"
    from solar_data_tools_spark.registry import R

    clip = clipping_stats(
        std.select("site", F.to_date("grid_ts").alias("date"), "value"),
        exact_digits=R,
    )
    cm = clip.agg(
        F.min(F.abs(F.col("clip_stat_1") - F.lit(0.05))).alias("m1"),
        F.min(F.abs(F.col("clip_stat_2") - F.lit(0.1))).alias("m2"),
    ).collect()[0]
    assert cm["m1"] >= 1e-9 and cm["m2"] >= 1e-9, f"clip margins {cm}"
    # r11 late addition: the spine now HASHES the interpolated p95
    # capacity itself (pround 1e-6) — same engine-pair interpolation
    # class q37 has certified for six rounds; measure its tick margin
    x = F.col("capacity") * F.lit(1e6) + F.lit(0.5)
    frac = x - F.floor(x)
    capm = cap.agg(
        F.min(F.least(frac, F.lit(1.0) - frac)).alias("m")
    ).collect()[0]["m"]
    assert capm >= 1e-7, f"capacity tick margin {capm}"
