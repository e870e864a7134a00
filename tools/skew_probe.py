#!/usr/bin/env python
"""Round-10 skew/overflow probe: measure the new operators at a scale
the test tables can't reach, with data synthesized ON THE CLUSTER
(spark.range + hash pseudo-randomness — deterministic, no files).

1. capped_join on a planted BOTH-SIDES-HOT pair: one key holds
   `--hot` rows on each side (the quadratic class q177 diagnoses —
   hot^2 pairs, which at the default 2M x 2M = 4e12 pairs would simply
   never finish), the rest uniform. The probe proves the capped join's
   wall time is governed by the UNIFORM volume + cap^2, not hot^2 —
   the whole point of the operator.
2. guarded_wide_sum at `--rows` rows with amplified tick terms whose
   TRUE sum is ~1e22 (past 2^63): the DECIMAL(38,0) escalation must
   complete, and its cost factor vs a plain LONG sum of the same rows
   at safe magnitude is the measured price of `wide=True`.

Usage: python tools/skew_probe.py [--rows 50000000] [--hot 2000000]
Prints one JSON line.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000_000)
    ap.add_argument("--hot", type=int, default=2_000_000)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--cap", type=int, default=100)
    args = ap.parse_args()

    from solar_data_tools_spark.operators.canonical import (
        guarded_wide_sum,
        ticks,
    )
    from solar_data_tools_spark.operators.skew import capped_join
    from solar_data_tools_spark.session import get_spark

    spark = get_spark(app_name="sdt-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float | int | str] = {
        "rows": args.rows,
        "hot": args.hot,
        "keys": args.keys,
        "cap": args.cap,
    }

    def side(tag: int):
        # first `hot` ids -> key 0 on BOTH sides; rest hashed uniform
        base = spark.range(args.rows)
        key = F.when(F.col("id") < args.hot, F.lit(0)).otherwise(
            F.pmod(F.xxhash64("id", F.lit(tag)), F.lit(args.keys)) + 1
        )
        return base.select(
            key.alias("k"), F.col("id").alias(f"id_{tag}")
        )

    joined, report = capped_join(
        side(1),
        side(2),
        "k",
        cap_left=args.cap,
        cap_right=args.cap,
        order_left=["id_1"],
        order_right=["id_2"],
    )
    t0 = time.perf_counter()
    n_pairs = joined.count()
    out["capped_join_sec"] = round(time.perf_counter() - t0, 1)
    out["capped_join_pairs"] = n_pairs
    t0 = time.perf_counter()
    hot_row = report.where(F.col("k") == 0).collect()[0]
    out["report_sec"] = round(time.perf_counter() - t0, 1)
    out["hot_true_pairs"] = float(hot_row["true_pairs"])
    out["hot_emitted_pairs"] = float(hot_row["emitted_pairs"])
    assert hot_row["true_pairs"] == float(args.hot) ** 2
    assert hot_row["emitted_pairs"] == float(args.cap) ** 2

    # wide sum: value in [0, 900), digits 6 -> tick < 9e8; x1e10 ->
    # term < 9e18 (inside LONG), true sum ~ rows * 2e18 ~ 1e26/1e22
    vals = spark.range(args.rows).select(
        ((F.abs(F.xxhash64("id", F.lit(3))) % 900_000) / 1000.0).alias(
            "v"
        )
    )
    term = ticks("v", 6) * F.lit(10_000_000_000).cast("long")
    t0 = time.perf_counter()
    wide = vals.agg(
        guarded_wide_sum(term, "probe").cast("string").alias("s")
    ).collect()[0]["s"]
    out["wide_sum_sec"] = round(time.perf_counter() - t0, 1)
    out["wide_sum_digits"] = len(wide)
    assert len(wide) > 19, wide  # genuinely past LONG's 19 digits

    t0 = time.perf_counter()
    vals.agg(F.sum(ticks("v", 6)).alias("s")).collect()
    out["narrow_long_sum_sec"] = round(time.perf_counter() - t0, 1)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
