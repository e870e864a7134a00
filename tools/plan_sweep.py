#!/usr/bin/env python
"""Round-13 full-registry plan sweep (guide §7.2 applied in bulk).

Builds every registered query's DataFrame at ``--sf`` and inspects the
FORMATTED physical plan for anti-patterns:

* ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — flagged unless
  the query is on the documented allowlist (1-row scalar crossJoins,
  deliberate small cross products);
* ``BatchEvalPython`` — row-at-a-time Python on a query path (the
  solver layer's ``ArrowEvalPython``/``FlatMapGroupsInPandas`` rides
  Arrow and is allowed where listed);
* parquet scans whose ``ReadSchema`` pulls the fat ``text`` /
  ``embedding`` / ``body`` columns in queries that should never read
  them (reported, human-adjudicated);
* Exchange count per query (recorded; regressions show up as diffs).

Writes one JSON summary; plans go to --plans-dir only with --save.

    python tools/plan_sweep.py --sf /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(
        REPO, "plans", "r13", "plan_sweep.json"))
    ap.add_argument("--save", action="store_true",
                    help="also save every formatted plan")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from solar_data_tools_spark.registry import QUERIES
    from solar_data_tools_spark.session import get_spark, load_tables
    from solar_data_tools_spark.shipping import ensure_package_on_executors

    spark = get_spark(app_name="sdt-plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, args.sf)
    ensure_package_on_executors(spark)

    names = list(QUERIES)
    if args.only:
        pres = [p.strip() for p in args.only.split(",")]
        names = [n for n in names if any(n.startswith(p) for p in pres)]

    report = {}
    for name in names:
        entry: dict = {}
        try:
            df = QUERIES[name].fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            report[name] = {"error": f"{type(exc).__name__}: {exc}"}
            traceback.print_exc(limit=1)
            continue
        entry["exchanges"] = len(re.findall(r"\bExchange\b", plan))
        entry["cartesian"] = plan.count("CartesianProduct")
        entry["bnlj"] = plan.count("BroadcastNestedLoopJoin")
        entry["batch_eval_python"] = plan.count("BatchEvalPython")
        entry["arrow_eval_python"] = plan.count("ArrowEvalPython")
        entry["grouped_pandas"] = (
            plan.count("FlatMapGroupsInPandas")
            + plan.count("MapInPandas")
            + plan.count("PythonMapInArrow")
        )
        entry["smj"] = plan.count("SortMergeJoin")
        entry["bhj"] = plan.count("BroadcastHashJoin")
        entry["shj"] = plan.count("ShuffledHashJoin")
        # fat columns read from parquet scans
        fat = []
        for chunk in plan.split("Scan parquet"):
            m = re.search(r"ReadSchema: struct<([^\n]*)", chunk)
            if not m:
                continue
            cols = m.group(1)
            for c in ("text:", "embedding:", "body:"):
                if c in cols:
                    fat.append(c.rstrip(":"))
        entry["fat_scan_cols"] = sorted(set(fat))
        report[name] = entry
        if args.save:
            d = os.path.join(REPO, "plans", "r13", "sweep")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        print(f"{name:40s} ex={entry['exchanges']:2d} "
              f"cart={entry['cartesian']} bnlj={entry['bnlj']} "
              f"py={entry['batch_eval_python']} "
              f"arrow={entry['arrow_eval_python']}", flush=True)

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    flags = {
        n: e for n, e in report.items()
        if e.get("cartesian") or e.get("batch_eval_python") or "error" in e
    }
    print(json.dumps({"queries": len(report), "flagged": flags}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
