#!/usr/bin/env python
"""Probe: incremental near-dup against a PERSISTED signature store must
cost O(new dump), not O(corpus) — the "history is never re-signed"
contract of dedup.minhash_incremental_dedup (VERDICT r11 item 1).

Three timed legs at --docs history + --docs new (default 1M + 1M):

  1. store_build   — sign the history once and persist (id, blocks,
                     signature) to parquet. This is the one-time cost a
                     production pipeline pays per dump AT APPEND TIME,
                     and doubles as the measured proxy for what
                     re-signing history would cost on every dump.
  2. incremental   — read the store (signatures only; the store carries
                     NO text, so history text is unreadable by
                     construction) and verdict the new dump against it.
  3. from_scratch  — the naive alternative: minhash_near_duplicates
                     over history+new combined, re-signing everything.

PASS shape: incremental ~= sign(new)+join and clearly below
from_scratch; the gap widens linearly with history size (re-run with
--history-mult 2). Results recorded in SURVEY.md §7.5.

Usage:
    python tools/probe_incremental_minhash.py --docs 1000000
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
    ap.add_argument("--docs", type=int, default=1_000_000,
                    help="docs per generation (history and new alike)")
    ap.add_argument("--history-mult", type=int, default=1,
                    help="history = mult * docs (to show O(new) scaling)")
    args = ap.parse_args()

    from solar_data_tools_spark.operators import dedup as dd
    from solar_data_tools_spark.session import get_spark

    spark = get_spark(app_name="sdt-incremental-minhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    n_hist = args.docs * args.history_mult

    # synth_corpus's dup plant (id - id%1000) never crosses the
    # history/new boundary, so build the corpus here with an explicit
    # cross-generation canon: 20% of NEW docs copy a history doc, 10%
    # copy a lower NEW doc, history itself is all-unique. Same
    # JVM-side word-hash text as tools/scale_probe.synth_corpus.
    doc_len, vocab_n = 60, 500
    vocab = ", ".join(f"'w{i}'" for i in range(vocab_n))
    base = spark.range(n_hist + args.docs)
    is_new = F.col("id") >= n_hist
    roll = F.abs(F.xxhash64("id", F.lit(7))) % 100
    canon = (
        F.when(is_new & (roll < 20), F.col("id") - n_hist)
        .when(is_new & (roll < 30),
              F.greatest(F.lit(n_hist),
                         F.col("id") - (F.col("id") % 50)))
        .otherwise(F.col("id"))
    )
    text = F.expr(
        f"concat_ws(' ', transform(sequence(1, {doc_len}), "
        f"i -> element_at(array({vocab}), "
        f"cast(abs(xxhash64(_canon, i)) % {vocab_n} as int) + 1)))"
    )
    both = base.withColumn("_canon", canon).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.concat(
            F.lit("l"), (F.abs(F.xxhash64("_canon", F.lit(3))) % 5)
        ).alias("lang"),
    )
    hist = both.where(F.col("doc_id") < n_hist)
    new = both.where(F.col("doc_id") >= n_hist)

    store_dir = tempfile.mkdtemp(prefix="sig_store_")
    try:
        t0 = time.perf_counter()
        dd.minhash_signatures(
            hist, 64, 1, carry_cols=["lang"], token_hash="md5_u31"
        ).write.mode("overwrite").parquet(store_dir)
        timings["store_build"] = round(time.perf_counter() - t0, 2)
        print(f"  store_build({n_hist/1e6:.0f}M): "
              f"{timings['store_build']} s", file=sys.stderr, flush=True)

        store = spark.read.parquet(store_dir)
        t0 = time.perf_counter()
        out = dd.minhash_incremental_dedup(
            new, store, num_hashes=64, bands=8, n=1, sim_threshold=0.7,
            block_cols=["lang"], token_hash="md5_u31",
        )
        counts = {
            r["verdict"]: r["n"]
            for r in out.groupBy("verdict").agg(
                F.count("*").alias("n")
            ).collect()
        }
        timings["incremental"] = round(time.perf_counter() - t0, 2)
        print(f"  incremental({args.docs/1e6:.0f}M new vs "
              f"{n_hist/1e6:.0f}M stored): {timings['incremental']} s "
              f"verdicts={counts}", file=sys.stderr, flush=True)

        # pre-banded persisted layout: band once at store-build time,
        # each dump then skips history's band explode AND the
        # candidate-verify lookup (store_is_banded=True)
        banded_dir = store_dir + "_banded"
        t0 = time.perf_counter()
        dd.minhash_band_store(
            store, bands=8, num_hashes=64, block_cols=["lang"]
        ).write.mode("overwrite").parquet(banded_dir)
        timings["store_band_once"] = round(time.perf_counter() - t0, 2)
        banded = spark.read.parquet(banded_dir)
        t0 = time.perf_counter()
        out_b = dd.minhash_incremental_dedup(
            new, banded, num_hashes=64, bands=8, n=1, sim_threshold=0.7,
            block_cols=["lang"], token_hash="md5_u31",
            store_is_banded=True,
        )
        counts_b = {
            r["verdict"]: r["n"]
            for r in out_b.groupBy("verdict").agg(
                F.count("*").alias("n")
            ).collect()
        }
        timings["incremental_banded"] = round(time.perf_counter() - t0, 2)
        assert counts_b == counts, (counts_b, counts)
        print(f"  incremental_banded: {timings['incremental_banded']} s "
              f"(verdicts identical)", file=sys.stderr, flush=True)

        t0 = time.perf_counter()
        dd.minhash_near_duplicates(
            both, num_hashes=64, bands=8, n=1, threshold=0.7,
            block_cols=["lang"], token_hash="md5_u31",
        ).write.format("noop").mode("overwrite").save()
        timings["from_scratch"] = round(time.perf_counter() - t0, 2)
        print(f"  from_scratch({(n_hist + args.docs)/1e6:.0f}M): "
              f"{timings['from_scratch']} s", file=sys.stderr, flush=True)
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)
        shutil.rmtree(store_dir + "_banded", ignore_errors=True)

    print(json.dumps({
        "probe": "incremental_minhash",
        "docs_new": args.docs,
        "docs_history": n_hist,
        "verdicts": counts,
        "timings_sec": timings,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
