#!/usr/bin/env python
"""Warm-wall timing of named registry queries in one session.

Usage: python tools/ab_warm.py <label> <q1,q2,...> [reps]

Prints one JSON line: per-query rep walls (rep0 = cold, includes codegen
compile; report the warm median of reps 1+ when comparing plan-build or
driver-overhead changes). Repo root is resolved from this file, so the
script also runs from a worktree checkout of another commit.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

label = sys.argv[1]
names = sys.argv[2].split(",")
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 6

from solar_data_tools_spark.registry import QUERIES
from solar_data_tools_spark.session import get_spark, load_tables
from solar_data_tools_spark.shipping import ensure_package_on_executors

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name=f"ab-warm-{label}")
spark.sparkContext.setLogLevel("ERROR")
for df in load_tables(spark, sf_dir).values():
    df.limit(1).collect()
ensure_package_on_executors(spark)

out = {"label": label, "sf_dir": sf_dir}
for name in names:
    fn = QUERIES[name].fn
    walls = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name} rep{i} [{label}]")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    out[name] = {
        "reps": walls,
        "warm_median": round(statistics.median(walls[1:]), 3)
        if len(walls) > 1
        else walls[0],
    }

print("ABRESULT " + json.dumps(out), flush=True)
