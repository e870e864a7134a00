#!/usr/bin/env python
"""Measure pure PLAN-BUILD time (Python driver + py4j, no execution) per
headline query: time fn(spark, sf_dir) alone, which constructs the
DataFrame. The r13 lesson: wide Column-object chains cost ~8 py4j round
trips each; SQL-string assembly collapses them to one parse call.

    python tools/build_time_probe.py [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from bench import HEADLINE
    from solar_data_tools_spark.registry import QUERIES
    from solar_data_tools_spark.session import get_spark, load_tables

    names = HEADLINE
    if args.only:
        pres = [p.strip() for p in args.only.split(",")]
        names = [n for n in QUERIES
                 if any(n.startswith(p) for p in pres)]

    spark = get_spark(app_name="sdt-build-probe")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, args.sf)

    total = 0.0
    for name in names:
        fn = QUERIES[name].fn
        fn(spark, args.sf)  # warm (imports, first-parse caches)
        obs = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf)
            obs.append(time.perf_counter() - t0)
        med = statistics.median(obs)
        total += med
        print(f"{name:32s} build_median={med * 1000:8.1f} ms")
    print(f"{'TOTAL':32s} build_median={total * 1000:8.1f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
