#!/usr/bin/env python
"""Interleaved timing of q47/q104 for the working-tree A/B of the
shared-per-doc doc_sets change. Prints one JSON line with per-rep walls.

Usage: python tools/ab_q47.py <label> [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

label = sys.argv[1] if len(sys.argv) > 1 else "run"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

from solar_data_tools_spark.registry import QUERIES
from solar_data_tools_spark.session import get_spark, load_tables
from solar_data_tools_spark.shipping import ensure_package_on_executors

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name=f"ab-q47-{label}")
spark.sparkContext.setLogLevel("ERROR")
for df in load_tables(spark, sf_dir).values():
    df.limit(1).collect()
ensure_package_on_executors(spark)

out = {"label": label, "sf_dir": sf_dir}
for name in ("q47_minhash_near_dups", "q104_minhash_pipeline_md5"):
    if name not in QUERIES:
        continue
    fn = QUERIES[name].fn
    walls = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name} rep{i} [{label}]")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    out[name] = walls

print("ABRESULT " + json.dumps(out), flush=True)
