#!/usr/bin/env python
"""Per-stage task-time attribution for one query: run a warm rep, then
print each stage submitted during it (name, tasks, executorRunTime).

    python tools/stage_attrib.py q182_minhash_incremental
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
    ap.add_argument("query")
    ap.add_argument("--warm-reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from solar_data_tools_spark.registry import QUERIES
    from solar_data_tools_spark.session import get_spark, load_tables
    from solar_data_tools_spark.shipping import ensure_package_on_executors

    spark = get_spark(app_name="sdt-stage-attrib")
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, args.sf).values():
        df.limit(1).collect()
    ensure_package_on_executors(spark)

    fn = QUERIES[args.query].fn
    for _ in range(args.warm_reps):
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()

    w0 = time.time() * 1000.0
    t0 = time.perf_counter()
    fn(spark, args.sf).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    gw = spark.sparkContext._gateway
    jvm = gw.jvm
    ss = spark.sparkContext._jsc.sc().statusStore()
    lst = ss.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    rows = []
    it = lst.iterator()
    while it.hasNext():
        s = it.next()
        sub = s.submissionTime()
        if sub.isEmpty() or sub.get().getTime() < w0:
            continue
        comp = s.completionTime()
        sw = (
            (comp.get().getTime() - sub.get().getTime()) / 1000.0
            if not comp.isEmpty() else float("nan")
        )
        rows.append((
            s.executorRunTime() / 1000.0,
            s.stageId(), s.numCompleteTasks(), sw,
            s.name()[:110],
        ))
    rows.sort(reverse=True)
    print(f"wall={wall:.2f}s  stages={len(rows)}")
    for task_s, sid, ntask, sw, name in rows:
        print(f"  task={task_s:7.2f}s wall={sw:6.2f}s tasks={ntask:4d} "
              f"stage{sid}: {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
