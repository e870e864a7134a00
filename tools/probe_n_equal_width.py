#!/usr/bin/env python
"""Probe: the incremental-dedup verify step at WIDE signature
geometries (VERDICT r12 "what's wrong" item 2).

``minhash_incremental_dedup``'s candidate verification builds a static
codegen sum of ``num_hashes`` per-component equality terms
(``_n_equal``, dedup.py) instead of an interpreted HOF fold. That is
measured-fastest at 64 hashes; this probe checks the shape survives
256 and 512 — i.e. that Catalyst analysis/codegen of the O(num_hashes)
expression tree neither blows up compile time nor silently falls out
of whole-stage codegen into something pathological.

Per geometry (64/8, 256/32, 512/64), over the same synthetic corpus:

  * plan_sec — wall to ANALYZE + OPTIMIZE + physical-plan the verdict
    frame (``df.queryExecution().executedPlan()`` forced via the py4j
    handle), before any execution. This is where an exploding
    expression tree would show.
  * exec_sec — end-to-end wall (noop write) including JIT of the
    generated code. Expect roughly linear in num_hashes (signing is
    num_hashes min-aggs; verify is num_hashes equality terms), NOT
    superlinear.
  * verdict counts — the planted cross-generation dups must be found
    at every geometry (wider signatures estimate the same Jaccard).

Usage:
    python tools/probe_n_equal_width.py --docs 50000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50_000,
                    help="docs per generation (history and new alike)")
    args = ap.parse_args()

    from solar_data_tools_spark.operators import dedup as dd
    from solar_data_tools_spark.session import get_spark

    spark = get_spark(app_name="sdt-n-equal-width-probe")
    spark.sparkContext.setLogLevel("ERROR")
    n = args.docs

    # same corpus generator as tools/probe_incremental_minhash.py: 20%
    # of NEW docs copy a history doc, 10% copy a lower NEW doc
    doc_len, vocab_n = 60, 500
    vocab = ", ".join(f"'w{i}'" for i in range(vocab_n))
    base = spark.range(2 * n)
    is_new = F.col("id") >= n
    roll = F.abs(F.xxhash64("id", F.lit(7))) % 100
    canon = (
        F.when(is_new & (roll < 20), F.col("id") - n)
        .when(is_new & (roll < 30),
              F.greatest(F.lit(n), F.col("id") - (F.col("id") % 50)))
        .otherwise(F.col("id"))
    )
    text = F.expr(
        f"concat_ws(' ', transform(sequence(1, {doc_len}), "
        f"i -> element_at(array({vocab}), "
        f"cast(abs(xxhash64(_canon, i)) % {vocab_n} as int) + 1)))"
    )
    both = base.withColumn("_canon", canon).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
    hist = both.where(F.col("doc_id") < n)
    new = both.where(F.col("doc_id") >= n)

    results = []
    for num_hashes, bands in [(64, 8), (256, 32), (512, 64)]:
        store_dir = tempfile.mkdtemp(prefix=f"sig_store_{num_hashes}_")
        try:
            dd.minhash_signatures(
                hist, num_hashes, 1, token_hash="md5_u31"
            ).write.mode("overwrite").parquet(store_dir)
            store = spark.read.parquet(store_dir)

            t0 = time.perf_counter()
            out = dd.minhash_incremental_dedup(
                new, store, num_hashes=num_hashes, bands=bands, n=1,
                sim_threshold=0.7, token_hash="md5_u31",
                # un-checkpointed so plan_sec times the REAL full tree
                # (localCheckpoint would hide the width behind a
                # truncated lineage)
                materialize="none",
            )
            # force analysis + optimization + physical planning only
            out._jdf.queryExecution().executedPlan()
            plan_sec = round(time.perf_counter() - t0, 2)

            t0 = time.perf_counter()
            counts = {
                r["verdict"]: r["n"]
                for r in out.groupBy("verdict")
                .agg(F.count("*").alias("n")).collect()
            }
            exec_sec = round(time.perf_counter() - t0, 2)
            results.append({
                "num_hashes": num_hashes, "bands": bands,
                "plan_sec": plan_sec, "exec_sec": exec_sec,
                "verdicts": counts,
            })
            print(f"  {num_hashes}/{bands}: plan {plan_sec} s, "
                  f"exec {exec_sec} s, verdicts={counts}",
                  file=sys.stderr, flush=True)
        finally:
            import shutil

            shutil.rmtree(store_dir, ignore_errors=True)

    # the planted 20% history / 10% snapshot classes must be live at
    # every geometry
    for r in results:
        assert r["verdicts"].get("history_dup", 0) > 0, r
        assert r["verdicts"].get("snapshot_dup", 0) > 0, r

    print(json.dumps({
        "probe": "n_equal_width",
        "docs_per_generation": n,
        "geometries": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
