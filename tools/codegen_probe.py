#!/usr/bin/env python
"""Instrument the q182-family cold-rep cliff (guide §7.3, VERDICT r13
item 2): run a query rep-by-rep in a FRESH session and, after each rep,
report deltas of

  * Janino codegen compiles (count / total ms / max generated-method
    bytecode) — ``CodegenMetrics``;
  * JVM JIT total compilation time — ``CompilationMXBean``;
  * GC time — summed over ``GarbageCollectorMXBean``s.

Usage:  python tools/codegen_probe.py q182_minhash_incremental --reps 5
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--set", action="append", default=[],
                    help="runtime SQLConf overrides, key=value")
    args = ap.parse_args()

    from solar_data_tools_spark.registry import QUERIES
    from solar_data_tools_spark.session import get_spark, load_tables
    from solar_data_tools_spark.shipping import ensure_package_on_executors

    spark = get_spark(app_name="sdt-codegen-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for kv in args.set:
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)
        print(f"conf {k}={v}", flush=True)
    jvm = spark._jvm
    cg = jvm.org.apache.spark.metrics.source.CodegenMetrics

    mgmt = jvm.java.lang.management.ManagementFactory

    def jit_ms():
        return mgmt.getCompilationMXBean().getTotalCompilationTime()

    def gc_ms():
        total = 0
        it = mgmt.getGarbageCollectorMXBeans().iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return total

    def task_ms():
        gw = spark.sparkContext._gateway
        ss = spark.sparkContext._jsc.sc().statusStore()
        lst = ss.stageList(
            jvm.java.util.ArrayList(), False, False,
            gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
        )
        total = 0
        it = lst.iterator()
        while it.hasNext():
            total += it.next().executorRunTime()
        return total

    def cg_stats():
        ct = cg.METRIC_COMPILATION_TIME()
        mb = cg.METRIC_GENERATED_METHOD_BYTECODE_SIZE()
        cb = cg.METRIC_GENERATED_CLASS_BYTECODE_SIZE()
        sz = cg.METRIC_SOURCE_CODE_SIZE()
        return {
            "compiles": ct.getCount(),
            "compile_ms_mean": ct.getSnapshot().getMean(),
            "method_bc_max": mb.getSnapshot().getMax(),
            "method_bc_p99": mb.getSnapshot().get99thPercentile(),
            "class_bc_max": cb.getSnapshot().getMax(),
            "src_max": sz.getSnapshot().getMax(),
        }

    for df in load_tables(spark, args.sf).values():
        df.limit(1).collect()
    ensure_package_on_executors(spark)
    import pandas as pd  # noqa: F401

    warm = spark.range(
        spark.sparkContext.defaultParallelism * 4
    ).repartition(spark.sparkContext.defaultParallelism)
    warm.mapInPandas(lambda it: it, schema="id long").count()

    fn = QUERIES[args.query].fn
    prev_jit, prev_gc, prev_task = jit_ms(), gc_ms(), task_ms()
    prev_cg = cg_stats()
    for i in range(args.reps):
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        now_jit, now_gc, now_cg = jit_ms(), gc_ms(), cg_stats()
        now_task = task_ms()
        print(
            f"rep{i} wall={wall:7.2f}s  "
            f"task+={(now_task - prev_task) / 1000:7.2f}s  "
            f"jit+={(now_jit - prev_jit) / 1000:6.2f}s  "
            f"gc+={(now_gc - prev_gc) / 1000:5.2f}s  "
            f"codegen+={now_cg['compiles'] - prev_cg['compiles']:3d} units  "
            f"compile_ms_mean={now_cg['compile_ms_mean']:7.1f}  "
            f"method_bc_max={now_cg['method_bc_max']}  "
            f"method_bc_p99={now_cg['method_bc_p99']:.0f}  "
            f"class_bc_max={now_cg['class_bc_max']}  "
            f"src_max={now_cg['src_max']}",
            flush=True,
        )
        prev_jit, prev_gc, prev_cg = now_jit, now_gc, now_cg
        prev_task = now_task
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
