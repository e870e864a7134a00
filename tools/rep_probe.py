#!/usr/bin/env python
"""Per-rep wall probe: run selected queries N reps in one fresh session and
print EVERY rep's wall (bench medians hide the warmup trajectory).

    python tools/rep_probe.py q182 q47 --reps 6
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("prefixes", nargs="+")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from solar_data_tools_spark.registry import QUERIES
    from solar_data_tools_spark.session import get_spark, load_tables
    from solar_data_tools_spark.shipping import ensure_package_on_executors

    names = [n for n in QUERIES
             if any(n.startswith(p) for p in args.prefixes)]
    spark = get_spark(app_name="sdt-rep-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, args.sf).values():
        df.limit(1).collect()
    ensure_package_on_executors(spark)
    import pandas as pd  # noqa: F401

    warm = spark.range(
        spark.sparkContext.defaultParallelism * 4
    ).repartition(spark.sparkContext.defaultParallelism)
    warm.mapInPandas(lambda it: it, schema="id long").count()

    for name in names:
        fn = QUERIES[name].fn
        walls = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode(
                "overwrite").save()
            walls.append(time.perf_counter() - t0)
        print(name, " ".join(f"{w:.2f}" for w in walls), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
