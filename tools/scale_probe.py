#!/usr/bin/env python
"""Reproducible scale probe: synthesize a fleet / corpus far larger than
the test tables and time the scale-critical operators on it.

Everything is generated ON THE CLUSTER with JVM-side expressions
(``spark.range`` + hash-based pseudo-randomness) — no driver-side data,
no files, deterministic for a given size. This is the evidence that the
operator plans scale with partition width rather than total volume: run
with 10x the rows and the per-row cost should hold.

Usage:
    python tools/scale_probe.py --sites 300 --days 365 --docs 200000
Prints one JSON line with per-operator wall seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402


def synth_fleet(spark, sites: int, days: int, slots_per_day: int = 288):
    """(site, ts, power): a clear-sky-ish sinusoid + hash noise + clipping,
    5-min grid. One spark.range, all columns JVM-side."""
    n = sites * days * slots_per_day
    base = spark.range(n)
    slot = (F.col("id") % slots_per_day).cast("double")
    day = (F.col("id") / slots_per_day).cast("long") % days
    site = (F.col("id") / (days * slots_per_day)).cast("long")
    # deterministic noise in [0,1): xxhash64 -> positive fraction
    noise = (F.abs(F.xxhash64("id", F.lit(1))) % 10000) / 10000.0
    frac = slot / slots_per_day
    sun = F.sin((frac - 0.25) * 2 * 3.141592653589793)
    seasonal = 0.8 + 0.2 * F.cos(
        (day.cast("double") / 365.2425) * 2 * 3.141592653589793
    )
    power = F.greatest(
        F.lit(0.0), F.least(F.lit(0.95), sun * seasonal * (0.9 + 0.2 * noise))
    )
    ts = F.timestamp_seconds(
        F.lit(1577836800) + day * 86400 + (slot * (86400 / slots_per_day))
    )
    from solar_data_tools_spark.operators.canonical import with_time_columns

    raw = base.select(
        site.alias("site"),
        ts.alias("ts"),
        F.col("id").alias("seq"),
        power.alias("value"),
    )
    return with_time_columns(raw, sampling_seconds=86400 // slots_per_day)


def synth_corpus(spark, docs: int, dup_frac: float = 0.1, doc_len: int = 60):
    """(doc_id, text, lang, source, n_chars): random word sequences from a
    500-word vocabulary; ``dup_frac`` of docs reuse the text of doc_id
    - (doc_id % 1000) to plant exact + near duplicates."""
    vocab = ", ".join(f"'w{i}'" for i in range(500))
    base = spark.range(docs)
    # words chosen by per-(doc, position) hash; duplicate docs re-derive
    # from their canonical id so the text matches bit-for-bit
    canon = F.when(
        (F.abs(F.xxhash64("id", F.lit(7))) % 100)
        < int(dup_frac * 100),
        F.col("id") - (F.col("id") % 1000),
    ).otherwise(F.col("id"))
    text = F.expr(
        f"concat_ws(' ', transform(sequence(1, {doc_len}), "
        f"i -> element_at(array({vocab}), "
        "cast(abs(xxhash64(_canon, i)) % 500 as int) + 1)))"
    )
    return (
        base.withColumn("_canon", canon)
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.concat(
                F.lit("l"), (F.abs(F.xxhash64("id", F.lit(3))) % 5)
            ).alias("lang"),
            F.concat(
                F.lit("src"), (F.abs(F.xxhash64("id", F.lit(4))) % 10)
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )


def timed(label, df, timings):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    timings[label] = round(time.perf_counter() - t0, 2)
    print(f"  {label}: {timings[label]} s", file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", type=int, default=300)
    ap.add_argument("--days", type=int, default=365)
    ap.add_argument("--slots", type=int, default=288)
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--media", type=int, default=50_000)
    ap.add_argument("--skip-solvers", action="store_true")
    args = ap.parse_args()

    from solar_data_tools_spark.operators import daily as dy
    from solar_data_tools_spark.operators import dedup as dd
    from solar_data_tools_spark.operators import sampling as sp
    from solar_data_tools_spark.session import get_spark
    from solar_data_tools_spark.shipping import ensure_package_on_executors

    spark = get_spark(app_name="sdt-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_package_on_executors(spark)
    timings: dict[str, float] = {}

    fleet_rows = args.sites * args.days * args.slots
    print(
        f"fleet: {args.sites} sites x {args.days} days x {args.slots} slots"
        f" = {fleet_rows/1e6:.1f}M rows; corpus: {args.docs} docs",
        file=sys.stderr,
    )

    meas = synth_fleet(spark, args.sites, args.days, args.slots)
    timed("fleet_synth_scan", meas, timings)
    timed(
        "daily_statistics",
        dy.daily_statistics(meas, slots_per_day=args.slots, approx_capacity=True),
        timings,
    )
    timed("clipping_stats", dy.clipping_stats(meas), timings)
    if not args.skip_solvers:
        from solar_data_tools_spark.solvers.decompositions import (
            fit_seasonal_quantile,
        )

        daily_e = dy.daily_statistics(
            meas, slots_per_day=args.slots, approx_capacity=True
        ).select("site", "date", "energy")
        timed(
            "seasonal_quantile_fit",
            fit_seasonal_quantile(daily_e, value_col="energy"),
            timings,
        )

    from solar_data_tools_spark.algorithms.profiler_studies import (
        latitude_study,
        longitude_study,
    )

    timed("latitude_study_sweep", latitude_study(meas), timings)
    timed(
        "longitude_study_sweep",
        longitude_study(
            meas, estimators=("calculated", "fit_l1", "fit_l2")
        ),
        timings,
    )

    docs = synth_corpus(spark, args.docs)
    timed("corpus_synth_scan", docs, timings)
    timed("exact_dedup", dd.exact_duplicates(docs), timings)
    timed(
        "minhash_near_dups",
        dd.minhash_near_duplicates(
            docs, num_hashes=64, bands=16, threshold=0.6, block_cols=["lang"]
        ),
        timings,
    )
    timed(
        "ngram_jaccard",
        dd.ngram_jaccard_pairs(
            docs, n=3, threshold=0.6, max_shingle_freq=200, block_cols=["lang"]
        ),
        timings,
    )
    timed(
        "substring_spans_8tok",
        dd.substring_duplicate_spans(docs, k=8),
        timings,
    )
    # line dedup needs multi-line docs: banner shared by all, footer by
    # doc_id%7 cohorts (both cross the doc-frequency bar and drop)
    multi = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("SHARED BANNER LINE"),
            F.col("text"),
            F.concat(F.lit("FOOTER-"), (F.col("doc_id") % 7).cast("string")),
        ).alias("text"),
    )
    timed("line_dedup", dd.line_dedup(multi, min_doc_freq=3), timings)
    timed("stratified_sample", sp.stratified_sample(
        docs, {"src0": 1.0, "src1": 0.5}, default_rate=0.1), timings)
    timed("global_shuffle", sp.global_shuffle_rank(docs), timings)
    timed("sequence_packing", sp.pack_sequences(docs, budget=2048), timings)

    timed(
        "simhash_near_dups_banded",
        dd.simhash_near_duplicates(docs, max_hamming=3),
        timings,
    )

    # URL layer: deterministic messy URL per doc (subdomain skew via
    # doc_id%4, two-level-suffix cohort, tracking params)
    from solar_data_tools_spark.operators import urls as ur

    with_urls = docs.select(
        "doc_id", "n_chars",
        F.concat(
            F.lit("https://cdn"), (F.col("doc_id") % 4).cast("string"),
            F.lit("."), F.col("source"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(".co.uk")).otherwise(
                F.lit(".com")
            ),
            F.lit("/p/"), (F.col("doc_id") % 5000).cast("string"),
            F.lit("?utm_source=x&b=1&a=2"),
        ).alias("url"),
    )
    timed(
        "url_canonicalize",
        with_urls.select(
            "doc_id",
            ur.canonicalize_url(F.col("url")).alias("canon_url"),
            ur.registered_domain(F.col("url")).alias("domain"),
        ),
        timings,
    )
    timed("url_dedup", ur.url_dedup(with_urls), timings)
    timed("domain_cap_1000", ur.domain_cap(with_urls, cap=1000), timings)
    timed(
        "domain_cap_1000_prefilter",
        ur.domain_cap(with_urls, cap=1000, prefilter_margin=2.0),
        timings,
    )

    from solar_data_tools_spark.operators import text as txp

    html = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><style>p{}</style></head><body><p>"),
            F.col("text"),
            F.lit(' &amp; tail</p><script>var x="</p>";</script></body></html>'),
        ).alias("html"),
    )
    timed(
        "html_extract",
        html.select("doc_id", txp.strip_html(F.col("html")).alias("text")),
        timings,
    )
    timed("gopher_rules", txp.gopher_rules(docs), timings)

    from solar_data_tools_spark.operators import curation as cu

    # pairs -> clusters on the planted-duplicate graph (the step after
    # pair generation); pair source = the minhash pipeline above.
    # connected_components runs its iterative actions at CALL time
    # (localCheckpoint + convergence aggregates), so time the call plus
    # the final materialization together.
    pairs = dd.minhash_near_duplicates(
        docs, num_hashes=64, bands=16, threshold=0.6, block_cols=["lang"]
    ).localCheckpoint(eager=True)  # pair generation timed separately above
    t0 = time.perf_counter()
    cc_out = cu.duplicate_clusters(pairs)
    cc_out.write.format("noop").mode("overwrite").save()
    timings["duplicate_clusters_cc"] = round(time.perf_counter() - t0, 2)
    print(
        f"  duplicate_clusters_cc: {timings['duplicate_clusters_cc']} s",
        file=sys.stderr, flush=True,
    )
    ev = docs.where(F.col("doc_id") % 997 == 0)  # ~0.1% "benchmark" set
    tr = docs.where(F.col("doc_id") % 997 != 0)
    timed("decontaminate_8gram", cu.decontaminate(tr, ev, n=8), timings)
    timed("repetition_stats", cu.repetition_stats(docs), timings)
    timed("pii_redaction", cu.redact_pii(docs), timings)
    timed("unigram_logprob", cu.unigram_logprob(docs), timings)

    # --- round-8 fixed-point tier: HLL registers over all 3-grams
    # (shuffle bounded at 2^12 rows however large the corpus) and the
    # all-integer Gumbel-top-k weighted draw (TakeOrdered, one pass)
    from solar_data_tools_spark.operators import sketches as sk

    grams8 = dd.word_ngrams(docs, n=3)
    timed(
        "hll_build_p12",
        sk.hll_build(grams8, token_col="shingle", p=12),
        timings,
    )
    timed(
        "weighted_sample_1k",
        sp.weighted_sample_without_replacement(
            docs.withColumn(
                "w", (F.length("text") + F.lit(1)).cast("long")
            ),
            k=1000,
            weight_col="w",
        ),
        timings,
    )

    # --- embedding layer: synthetic unit-ish vectors from JVM-side hash
    # noise (dim 64, ~n/256 planted near-duplicate cohorts via canonical
    # ids), then the similarity/dedup operators at corpus scale.
    from solar_data_tools_spark.operators import similarity as sim

    n_emb = args.docs // 2
    dim = 64
    ecanon = F.when(
        (F.abs(F.xxhash64("id", F.lit(11))) % 100) < 10,
        F.col("id") - (F.col("id") % 256),
    ).otherwise(F.col("id"))
    evec = F.expr(
        f"transform(sequence(1, {dim}), "
        "i -> cast(abs(xxhash64(_ec, i)) % 10000 as double) / 10000.0 - 0.5)"
    )
    emb = (
        spark.range(n_emb)
        .withColumn("_ec", ecanon)
        .select(F.col("id").alias("vec_id"), evec.alias("embedding"))
    )
    timed("emb_synth_scan", emb, timings)
    seeds = spark.createDataFrame(
        [
            (j, [1.0 if k == j % dim else 0.1 for k in range(dim)])
            for j in range(64)
        ],
        "cluster int, cvec array<double>",
    )
    timed("centroid_assign_64c", sim.centroid_assign(emb, seeds), timings)
    # hash-uniform vectors collapse onto few centroids, so this is the
    # guard's worst case on purpose: without max_cell_size the within-
    # cell join is ~(n/4)^2; the subsplit bounds every join group to
    # 2000 rows (O(n * max_cell_size) total pair work, linear in n)
    timed(
        "semdedup_64c_guarded",
        sim.semdedup(
            emb, seeds, tau=0.95,
            max_cell_size=2000,
            on_mega_cell="subsplit",
            pair_engine="pandas",
        ),
        timings,
    )
    timed("quantize_int8", sim.quantize_embeddings(emb), timings)
    timed("matryoshka_16", sim.truncate_embeddings(emb, 16), timings)
    q100 = emb.where(F.col("vec_id") % (n_emb // 100) == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    import random as _random

    # 32 planes / 3 bands -> ~10-bit band buckets: candidate sets stay
    # in the hundreds per query instead of thousands (16 planes / 4-bit
    # bands measured 24 s here from bucket collisions alone)
    _rng = _random.Random(42)
    planes = [
        [_rng.gauss(0, 1) for _ in range(dim)] for _ in range(32)
    ]
    timed(
        "lsh_topk_100q",
        sim.lsh_topk(emb, q100, planes, k=5, max_hamming=2),
        timings,
    )

    # --- PQ / IVF-PQ: compressed-index build + ADC search. Encode is a
    # pure projection (cost ~ rows); searches scan (id, cell, codes)
    # rows only, so their cost tracks corpus width, not vector width.
    from solar_data_tools_spark.operators import pq as pqm

    t0 = time.perf_counter()
    books = pqm.train_pq_codebooks(emb, m=8, k=16, n_iters=5)
    timings["pq_train"] = round(time.perf_counter() - t0, 2)
    codes = pqm.pq_encode(emb, books)
    timed("pq_encode", codes, timings)
    timed(
        "pq_adc_topk_100q",
        pqm.pq_adc_topk(codes, q100, books, k=5),
        timings,
    )
    t0 = time.perf_counter()
    cent, rbooks, rcodes = pqm.ivfpq_build(
        emb, n_cells=64, m=8, k=16, n_iters=3
    )
    timings["ivfpq_build_train"] = round(time.perf_counter() - t0, 2)
    timed("ivfpq_encode", rcodes, timings)
    timed(
        "ivfpq_topk_100q_probe8",
        pqm.ivfpq_topk(rcodes, q100, cent, rbooks, k=5, n_probe=8),
        timings,
    )

    # --- DSIR selection: two hash-grained bag models + broadcast
    # log-ratio join; corpus text read once, never shuffled
    from solar_data_tools_spark.operators.curation import dsir_select

    timed(
        "dsir_select_1pct",
        dsir_select(
            docs, docs.where(F.col("lang") == "l0"),
            k=max(args.docs // 100, 10), n_features=1 << 16,
        ),
        timings,
    )

    # --- blocklist: zero-shuffle arrays_overlap over host suffixes
    from solar_data_tools_spark.operators import urls as ur

    crawl = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://sub"), (F.col("doc_id") % 97).cast("string"),
            F.lit("."), F.col("source"), F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    timed(
        "blocklist_mark_10k",
        ur.blocklist_mark(
            crawl,
            [f"blocked{i}.example.com" for i in range(10_000)]
            + ["src3.example.com"],
        ),
        timings,
    )

    # --- BPE: driver-sample training + distributed memoized apply
    from solar_data_tools_spark.operators import tokenize as tkz

    t0 = time.perf_counter()
    merges = tkz.train_bpe_merges(docs, n_merges=200, sample_cap=4096)
    timings["bpe_train_200m_4k"] = round(time.perf_counter() - t0, 2)
    timed("bpe_encode", tkz.bpe_encode(docs, merges), timings)

    # --- media layer: N real animated-GIF payloads synthesized ON the
    # executors (q118 recipe), then the decode-bearing operators. Payload
    # bytes are born and consumed inside one task — never shuffled.
    from solar_data_tools_spark.operators import multimodal as mmod

    def _gen_media(batches):
        import numpy as np
        import pandas as pd

        from solar_data_tools_spark.operators.multimodal import (
            encode_gif_animation,
        )

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                total = 2 + mid % 5
                frames = [
                    np.full((12, 16, 3), (mid * 37 + k * 101) % 256, np.uint8)
                    for k in range(total)
                ]
                rows.append(
                    (mid, "video",
                     encode_gif_animation(frames, [10] * total),
                     None, None, None, None)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "modality", "content",
                         "mime_type", "width", "height", "duration_s"],
            )

    media = (
        spark.range(args.media)
        .repartition(spark.sparkContext.defaultParallelism * 4)
        .mapInPandas(_gen_media, schema=mmod.MEDIA_SCHEMA)
    )
    timed("media_synth_encode_gif", media, timings)
    timed("media_extract_features", mmod.extract_features(media), timings)
    timed("media_sample_frames", mmod.sample_frames(media, 3), timings)
    timed("media_resize_bilinear", mmod.resize_media(media, 8, 8), timings)

    print(json.dumps({
        "fleet_rows": fleet_rows,
        "corpus_docs": args.docs,
        "media_payloads": args.media,
        "timings": timings,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
