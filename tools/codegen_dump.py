#!/usr/bin/env python
"""Dump a query's whole-stage-codegen sources (debug.codegenString) and
summarize unit sizes, so the 'huge generated method' (> 8000 bytecodes
never JIT-compiles) can be attributed to an operator.

    python tools/codegen_dump.py q182_minhash_incremental --out /tmp/cg.txt
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--out", default="/tmp/codegen_dump.txt")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from solar_data_tools_spark.registry import QUERIES
    from solar_data_tools_spark.session import get_spark, load_tables

    spark = get_spark(app_name="sdt-codegen-dump")
    spark.sparkContext.setLogLevel("ERROR")
    # AQE wraps every stage in an unexecuted AdaptiveSparkPlan, hiding
    # its WSCG subtrees from codegenString; the static plan's codegen
    # shapes are what we need to attribute generated-code size
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    load_tables(spark, args.sf)

    df = QUERIES[args.query].fn(spark, args.sf)
    plan = df._jdf.queryExecution().executedPlan()
    s = spark._jvm.org.apache.spark.sql.execution.debug.__getattr__(
        "package$"
    ).__getattr__("MODULE$").codegenString(plan)
    with open(args.out, "w") as f:
        f.write(s)
    # summarize: units come as '== Subtree N / M ... Generated code:'
    units = re.split(r"== Subtree (\d+) / \d+", s)
    print(f"wrote {args.out} ({len(s)} chars)")
    for i in range(1, len(units), 2):
        body = units[i + 1]
        first = next(
            (ln.strip() for ln in body.splitlines() if ln.strip()), "")
        # count method bodies and the longest method by source lines
        print(f"subtree {units[i]}: {len(body)} chars | {first[:100]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
