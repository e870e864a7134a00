#!/usr/bin/env python
"""Probe: MEASURED recall of the embedding LSH dedup path
(dedup.embedding_incremental_dedup method="lsh") against planted
ground truth — the r12 verdict's "recall is unit-pinned only" caveat,
turned into a curve.

Construction (ground truth by construction, no exact-method run
needed): store = N random unit vectors (seeded numpy — probe-only RNG,
never certified-path); for each target cosine c in the grid, K new
vectors built as v_new = c*v + sqrt(1-c^2)*u (u a random orthogonal
unit), each paired to a distinct store vector, so every planted pair
has EXACTLY cosine c. Random-pair background at dim 64 concentrates
near cosine 0 +- ~0.12, far from the 0.9 threshold, so planted pairs
are the only true dups.

Measured, per (c, max_hamming) at 64 seeded hyperplanes:

  * recall — fraction of planted pairs with c >= threshold verdicted
    store_dup. The docstring's sizing rule says pairs at cosine c
    differ in ~64*arccos(c)/pi expected signature bits (6.5 at 0.95,
    8.2 at 0.92, 9.0 at 0.905), so max_hamming=6 should visibly miss
    at c<=0.92 and a budget sized ABOVE the expected bits with margin
    should approach 1.0 — the probe checks the guidance, not just the
    code.
  * false accepts — planted pairs BELOW threshold (c=0.85) verdicted
    store_dup: must be ZERO at every geometry (the exact-cosine verify
    makes LSH conservative: it can only miss, never invent).

Usage:
    python tools/probe_lsh_recall.py --store 5000 --per-bucket 500
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", type=int, default=5000)
    ap.add_argument("--per-bucket", type=int, default=500)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd

    from solar_data_tools_spark.operators.dedup import (
        embedding_incremental_dedup,
    )
    from solar_data_tools_spark.operators.similarity import (
        seeded_hyperplanes,
    )
    from solar_data_tools_spark.session import get_spark

    spark = get_spark(app_name="sdt-lsh-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.Generator(np.random.PCG64(12345))
    n, k, dim = args.store, args.per_bucket, args.dim
    threshold = 0.9
    cosines = [0.95, 0.92, 0.905, 0.85]  # last is below threshold
    assert n >= k * len(cosines)

    store_m = rng.standard_normal((n, dim))
    store_m /= np.linalg.norm(store_m, axis=1, keepdims=True)

    new_rows, truth = [], {}
    nid = 1_000_000
    for bi, c in enumerate(cosines):
        for j in range(k):
            si = bi * k + j  # distinct store partner per planted pair
            v = store_m[si]
            u = rng.standard_normal(dim)
            u -= (u @ v) * v
            u /= np.linalg.norm(u)
            w = c * v + np.sqrt(1 - c * c) * u
            new_rows.append((nid, list(map(float, w))))
            truth[nid] = (c, si)
            nid += 1

    store_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": [list(map(float, r)) for r in store_m],
            }
        )
    )
    new_df = spark.createDataFrame(
        pd.DataFrame(new_rows, columns=["vec_id", "embedding"])
    )

    planes = seeded_hyperplanes(64, dim, seed=7)
    out = {"probe": "lsh_recall", "store": n, "per_bucket": k,
           "dim": dim, "threshold": threshold, "n_planes": 64,
           "expected_diff_bits": {
               str(c): round(64 * float(np.arccos(c)) / np.pi, 1)
               for c in cosines
           },
           "geometries": []}
    for max_hamming in (6, 10, 14):
        verdicts = {
            r["vec_id"]: (r["verdict"], r["matched_id"])
            for r in embedding_incremental_dedup(
                new_df, store_df, threshold=threshold, method="lsh",
                planes=planes, max_hamming=max_hamming,
            ).collect()
        }
        rec, fa = {}, 0
        for c in cosines:
            ids = [i for i, (cc, _) in truth.items() if cc == c]
            hits = sum(
                1 for i in ids if verdicts.get(i, ("new",))[0] == "store_dup"
            )
            if c >= threshold:
                rec[str(c)] = round(hits / len(ids), 3)
            else:
                fa += hits
        out["geometries"].append(
            {"max_hamming": max_hamming, "recall": rec,
             "false_accepts_below_threshold": fa}
        )
        assert fa == 0, "LSH produced a dup below the exact threshold"
        print(f"  max_hamming={max_hamming}: recall={rec} fa={fa}",
              file=sys.stderr, flush=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
