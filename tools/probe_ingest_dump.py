#!/usr/bin/env python
"""Probe: the COMPOSED per-dump ingest job (plans.ingest.ingest_dump)
at the production ratio VERDICT r12 asked for — a 500k-doc dump against
4M-doc persisted stores (exact hashes + MinHash signatures + vectors
with persisted lsh_sig).

Planted dump structure (deterministic, JVM-side synthesis — no driver
data): 10% exact copies of history docs, 10% NEAR copies of history
(one extra word -> MinHash stage), 5% exact + 5% near copies of lower
NEW docs, 3% embedding-only store dups + 2% embedding-only batch dups
(unique text, copied vector), 5% too-short (quality gate), rest unique
— so every stage does real work and every verdict class is live.

Timed legs:
  1. store_build     — one-time: sign/hash/embed 4M history, persist
                       all three stores (the per-dump APPEND cost a
                       production pipeline amortizes).
  2. ingest_composed — the full 4-stage job: verdicts + 3 deltas
                       written (noop sink for verdicts, counts forced).
  3. minhash_alone   — the dominant standalone stage at the same
                       ratio, for composition-overhead context (r12
                       recorded 40.4 s for this leg on this host).

PASS shape: ingest_composed stays O(dump + one scan per store), far
below any from-scratch reprocessing of 4.5M docs. MEASURED (local[32],
idle): store_build 115.5 s, ingest_composed 96.75 s, minhash_alone
44.1 s. The composed job is ~2.2x the dominant standalone stage — the
pre-run prediction of ~1.5x was wrong and is recorded as such: the
exact stage's 4M-distinct-hash join and the embedding stage's banded
join against 4M store vectors are each a full store SCAN (narrow
columns, no store-wide shuffle of payloads), not scan-free. The number
that matters for the O(dump) claim: the full 4-stage composed run
costs LESS than the 103.5 s it took (r12 probe) just to RE-SIGN the
MinHash history alone, and less than the 115.5 s one-time build of the
three stores. Embedding geometry: 64 seeded planes / max_hamming 2 —
targets the planted near-exact vector dups (identical vectors,
Hamming 0); pairs at cosine ~0.9 would need a wider Hamming budget
(the operator's documented recall contract).

Usage:
    python tools/probe_ingest_dump.py --new 500000 --hist 4000000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--new", type=int, default=500_000)
    ap.add_argument("--hist", type=int, default=4_000_000)
    ap.add_argument(
        "--loop", type=int, default=0,
        help="instead of the single-shot legs, run N successive "
             "generations appending the three store deltas between "
             "dumps — the monthly production loop; per-dump wall must "
             "stay ~flat while the stores accrete keeps",
    )
    args = ap.parse_args()

    from solar_data_tools_spark.operators import dedup as dd
    from solar_data_tools_spark.operators.similarity import (
        random_hyperplane_signatures,
        seeded_hyperplanes,
    )
    from solar_data_tools_spark.plans.ingest import ingest_dump
    from solar_data_tools_spark.session import get_spark

    spark = get_spark(app_name="sdt-ingest-dump-probe")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    n_hist, n_new = args.hist, args.new

    doc_len, vocab_n, dim = 60, 500, 16
    vocab = ", ".join(f"'w{i}'" for i in range(vocab_n))
    base = spark.range(n_hist + n_new)
    is_new = F.col("id") >= n_hist
    roll = F.abs(F.xxhash64("id", F.lit(7))) % 100
    # text canon: which doc's words this doc carries
    canon = (
        F.when(is_new & (roll < 20), F.col("id") - n_hist)
        .when(
            is_new & (roll < 30),
            F.greatest(F.lit(n_hist), F.col("id") - (F.col("id") % 50)),
        )
        .otherwise(F.col("id"))
    )
    # near (not exact) copies for the MinHash slice: one extra word
    near = is_new & (((roll >= 10) & (roll < 20)) | ((roll >= 25) & (roll < 30)))
    short = is_new & (roll >= 95)
    words = F.when(short, F.lit(3)).otherwise(F.lit(doc_len))
    text = F.concat(
        F.expr(
            f"concat_ws(' ', transform(sequence(1, _words), "
            f"i -> element_at(array({vocab}), "
            f"cast(abs(xxhash64(_canon, i)) % {vocab_n} as int) + 1)))"
        ),
        F.when(near, F.concat(F.lit(" x"), F.col("id"))).otherwise(
            F.lit("")
        ),
    )
    # vector canon: embedding-only dups copy a vector under unique text
    vcanon = (
        F.when(is_new & (roll >= 30) & (roll < 33), F.col("id") - n_hist)
        .when(
            is_new & (roll >= 33) & (roll < 35),
            F.greatest(F.lit(n_hist), F.col("id") - (F.col("id") % 50)),
        )
        .otherwise(F.col("id"))
    )
    vec = F.expr(
        f"transform(sequence(1, {dim}), j -> "
        "cast(abs(xxhash64(_vcanon, j)) % 2001 as double) / 1000.0 - 1.0)"
    )
    both = (
        base.withColumn("_canon", canon)
        .withColumn("_words", words)
        .withColumn("_vcanon", vcanon)
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            vec.alias("embedding"),
        )
    )
    hist = both.where(F.col("doc_id") < n_hist)
    new = both.where(F.col("doc_id") >= n_hist)
    planes = seeded_hyperplanes(64, dim, seed=11)

    root = tempfile.mkdtemp(prefix="ingest_probe_")
    exact_dir = f"{root}/exact"
    sig_dir = f"{root}/sigs"
    vec_dir = f"{root}/vecs"
    try:
        t0 = time.perf_counter()
        hist.select(
            F.md5(dd.normalize_text(F.col("text"))).alias("content_md5")
        ).write.parquet(exact_dir)
        dd.minhash_signatures(
            hist.select("doc_id", "text"), 64, 1, token_hash="md5_u31"
        ).write.parquet(sig_dir)
        random_hyperplane_signatures(
            hist.select("doc_id", "embedding"), planes,
            id_col="doc_id", vec_col="embedding",
        ).write.parquet(vec_dir)
        timings["store_build"] = round(time.perf_counter() - t0, 2)
        print(
            f"  store_build({n_hist/1e6:.1f}M x3 stores): "
            f"{timings['store_build']} s",
            file=sys.stderr, flush=True,
        )

        if args.loop:
            # the monthly loop: N successive dumps, each verdicted
            # against the stores AS LEFT by the previous generation,
            # each appending its three deltas (minhash keeps carry
            # their signatures — no re-signing; embedding keeps are
            # signed ONCE at admission, the loop-test pattern). Every
            # dump has the same planted class mix (copies reference
            # gen-0 history, which keeps survive in the store), so
            # per-dump wall must stay ~flat while the stores grow.
            gens = []
            for g in range(args.loop):
                gbase = n_hist + g * n_new
                gcanon = (
                    F.when(roll < 20, F.col("id") - gbase)
                    .when(
                        roll < 30,
                        F.greatest(
                            F.lit(gbase), F.col("id") - (F.col("id") % 50)
                        ),
                    )
                    .otherwise(F.col("id"))
                )
                gvcanon = (
                    F.when(
                        (roll >= 30) & (roll < 33), F.col("id") - gbase
                    )
                    .when(
                        (roll >= 33) & (roll < 35),
                        F.greatest(
                            F.lit(gbase), F.col("id") - (F.col("id") % 50)
                        ),
                    )
                    .otherwise(F.col("id"))
                )
                dump = (
                    spark.range(gbase, gbase + n_new)
                    .withColumn("_canon", gcanon)
                    .withColumn("_words", words)
                    .withColumn("_vcanon", gvcanon)
                    .select(
                        F.col("id").alias("doc_id"),
                        text.alias("text"),
                        vec.alias("embedding"),
                    )
                )
                t0 = time.perf_counter()
                out = ingest_dump(
                    dump.select("doc_id", "text"),
                    exact_store=spark.read.parquet(exact_dir),
                    minhash_store=spark.read.parquet(sig_dir),
                    vector_store=spark.read.parquet(vec_dir),
                    new_embeddings=dump.select("doc_id", "embedding"),
                    quality_filter=F.size(
                        F.split(dd.normalize_text(F.col("text")), " ")
                    ) >= 5,
                    num_hashes=64, bands=8, n=1, sim_threshold=0.7,
                    token_hash="md5_u31",
                    embedding_threshold=0.9, embedding_method="lsh",
                    planes=planes, max_hamming=2,
                )
                counts = {
                    r["verdict"]: r["n"]
                    for r in out["verdicts"].groupBy("verdict")
                    .agg(F.count("*").alias("n")).collect()
                }
                out["exact_delta"].write.mode("append").parquet(exact_dir)
                out["minhash_delta"].write.mode("append").parquet(sig_dir)
                random_hyperplane_signatures(
                    out["embedding_delta"], planes,
                    id_col="doc_id", vec_col="embedding",
                ).write.mode("append").parquet(vec_dir)
                wall = round(time.perf_counter() - t0, 2)
                store_rows = spark.read.parquet(sig_dir).count()
                gens.append({
                    "gen": g, "wall_sec": wall, "verdicts": counts,
                    "sig_store_rows_after": store_rows,
                })
                print(
                    f"  gen {g}: {wall} s verdicts={counts} "
                    f"sig_store={store_rows}",
                    file=sys.stderr, flush=True,
                )
            print(json.dumps({
                "probe": "ingest_dump_loop",
                "docs_new": n_new,
                "docs_history_initial": n_hist,
                "store_build_sec": timings["store_build"],
                "generations": gens,
            }))
            spark.stop()
            return

        t0 = time.perf_counter()
        out = ingest_dump(
            new.select("doc_id", "text"),
            exact_store=spark.read.parquet(exact_dir),
            minhash_store=spark.read.parquet(sig_dir),
            vector_store=spark.read.parquet(vec_dir),
            new_embeddings=new.select("doc_id", "embedding"),
            quality_filter=F.size(
                F.split(dd.normalize_text(F.col("text")), " ")
            ) >= 5,
            num_hashes=64, bands=8, n=1, sim_threshold=0.7,
            token_hash="md5_u31",
            embedding_threshold=0.9, embedding_method="lsh",
            planes=planes, max_hamming=2,
        )
        counts = {
            r["verdict"]: r["n"]
            for r in out["verdicts"].groupBy("verdict")
            .agg(F.count("*").alias("n")).collect()
        }
        deltas = {
            k: out[k].count()
            for k in ("exact_delta", "minhash_delta", "embedding_delta")
        }
        timings["ingest_composed"] = round(time.perf_counter() - t0, 2)
        print(
            f"  ingest_composed({n_new/1e3:.0f}k vs {n_hist/1e6:.1f}M): "
            f"{timings['ingest_composed']} s verdicts={counts} "
            f"deltas={deltas}",
            file=sys.stderr, flush=True,
        )

        t0 = time.perf_counter()
        dd.minhash_incremental_dedup(
            new.select("doc_id", "text"), spark.read.parquet(sig_dir),
            num_hashes=64, bands=8, n=1, sim_threshold=0.7,
            token_hash="md5_u31",
        ).groupBy("verdict").count().collect()
        timings["minhash_alone"] = round(time.perf_counter() - t0, 2)
        print(
            f"  minhash_alone: {timings['minhash_alone']} s",
            file=sys.stderr, flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps({
        "probe": "ingest_dump",
        "docs_new": n_new,
        "docs_history": n_hist,
        "verdicts": counts,
        "deltas": deltas,
        "timings_sec": timings,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
