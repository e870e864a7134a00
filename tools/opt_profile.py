#!/usr/bin/env python
"""Round-13 optimization profiler (guide §1: measure first).

For each selected query: capture ``explain("formatted")`` to
``plans/r13/<name>_<tag>.txt``, run it ``--reps`` times against the noop
sink under a dedicated job group, and report wall seconds plus the
job/stage count Spark actually scheduled (overhead-bound queries show a
high job+stage count against tiny data; shuffle-bound ones show few jobs
with fat stages). Plan-shape counters (Exchange / BatchEvalPython /
ArrowEvalPython / join strategies / PushedFilters) are greppable from
the saved plan files.

    python tools/opt_profile.py --tag before
    python tools/opt_profile.py --tag after --only q47,q148
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default=None,
                    help="comma-separated query-name prefixes")
    ap.add_argument("--plans-dir", default=os.path.join(REPO, "plans", "r13"))
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    from bench import HEADLINE
    from solar_data_tools_spark.registry import QUERIES
    from solar_data_tools_spark.session import get_spark, load_tables
    from solar_data_tools_spark.shipping import ensure_package_on_executors

    names = HEADLINE
    if args.only:
        pres = [p.strip() for p in args.only.split(",") if p.strip()]
        names = [n for n in QUERIES if any(n.startswith(p) for p in pres)]

    spark = get_spark(app_name="sdt-opt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # same warmup as bench.py so numbers are comparable
    for df in load_tables(spark, args.sf).values():
        df.limit(1).collect()
    ensure_package_on_executors(spark)
    warm = spark.range(sc.defaultParallelism * 4).repartition(
        sc.defaultParallelism)
    warm.mapInPandas(lambda it: it, schema="id long").count()

    os.makedirs(args.plans_dir, exist_ok=True)
    tracker = sc.statusTracker()
    results = {}
    for name in names:
        fn = QUERIES[name].fn
        df = fn(spark, args.sf)
        if not args.no_plans:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
        obs = []
        group = f"prof-{name}"
        for rep in range(args.reps):
            sc.setJobGroup(group if rep == 0 else f"{group}-r{rep}",
                           f"{name} rep{rep}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            obs.append(time.perf_counter() - t0)
        sc.setJobGroup("idle", "idle")
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        results[name] = {
            "median_s": round(statistics.median(obs), 3),
            "min_s": round(min(obs), 3),
            "jobs_rep0": len(job_ids),
            "stages_rep0": n_stages,
            "tasks_rep0": n_tasks,
        }
        print(f"{name:34s} med={results[name]['median_s']:7.3f}s "
              f"min={results[name]['min_s']:7.3f}s "
              f"jobs={len(job_ids):3d} stages={n_stages:3d} "
              f"tasks={n_tasks:4d}", flush=True)

    out = {
        "sf": args.sf,
        "tag": args.tag,
        "reps": args.reps,
        "total_median_s": round(
            sum(r["median_s"] for r in results.values()), 3),
        "queries": results,
    }
    path = os.path.join(args.plans_dir, f"profile_{args.tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"total_median_s": out["total_median_s"],
                      "written": path}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
