#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is fully materialized with a noop-format write (forces the
whole plan, including columns a count() would prune). Timings are wall
seconds per query; "value" is the total.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def _spin_worker(n_iter: int) -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(n_iter):
        acc = (acc * 31 + i) & 0xFFFFFFFF
    return time.perf_counter() - t0


HEADLINE = [
    # relational core
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q05_window_topk",
    # time-series / solar layer
    "q10_daily_energy",
    "q13_daily_density",
    "q14_sampling_inference",
    "q19_gap_fill",
    "q26_asof_join",
    "q30_clipping_stats",
    # corpus / embedding layer
    "q45_ngram_jaccard",
    "q46_knn_bruteforce",
    "q47_minhash_near_dups",
    # LLM-extension tier (round 10, r9 verdict item 7): a pure-codegen
    # string pipeline and an iterative all-LONG shuffle loop, so the
    # extension half of the engine has a round-over-round perf trace
    "q123_url_canonicalize",
    "q148_pagerank",
    # solver layer
    "q50_seasonal_fit",
    # incremental-curation flagship (round 13, r12 verdict item 5):
    # the per-dump MinHash loop against a persisted signature store —
    # the job a production crawl pipeline runs monthly — so its wall
    # is recorded per round like q47/q148. NOTE: the headline total
    # grew by this query's wall at its introduction (BENCH_r13);
    # compare totals across rounds on the shared 15-query prefix.
    "q182_minhash_incremental",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from solar_data_tools_spark.registry import QUERIES
    from solar_data_tools_spark.session import get_spark

    spark = get_spark(app_name="sdt-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: touch every table once so JVM/codegen startup isn't billed to
    # q01, and boot the Python worker pool (long-lived on a real cluster) so
    # solver-layer queries measure work, not interpreter startup
    from solar_data_tools_spark.session import load_tables
    from solar_data_tools_spark.shipping import ensure_package_on_executors

    for df in load_tables(spark, sf_dir).values():
        df.limit(1).collect()
    ensure_package_on_executors(spark)
    import pandas as pd  # noqa: F401

    warm = spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    )
    warm.mapInPandas(lambda it: it, schema="id long").count()

    # three executions per query, report the MEDIAN: rounds 6-7 showed
    # a uniform +-15-30% drift on sub-second queries under box load that
    # made round-over-round comparison mushy (r7 verdict item 7); the
    # median of 3 is robust to one loaded rep in either direction, while
    # min-of-2 still billed a slow first rep whenever both were slow.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    # load proxy (r8 verdict item 6): a fixed CPU-bound spin sample so a
    # reader can separate plan changes from box noise. On an idle box
    # the calibrated spin takes ~spin_target seconds; under contention
    # it stretches proportionally to run-queue pressure. Reported as
    # load_proxy = median observed / nominal — 1.0 means idle, 2.0
    # means the box ran this bench at half speed.
    def _spin_sample(n_iter: int = 2_000_000) -> float:
        # same loop as the parallel probe's worker BY CONSTRUCTION —
        # load_proxy and parallel_stretch divide these against each
        # other, so they must measure identical work
        return _spin_worker(n_iter)

    spin_obs = [_spin_sample() for _ in range(3)]
    # nominal = idle-box single-thread time for this loop, calibrated
    # round 9 (idle median 0.20 s over 7 samples); pinned so the ratio
    # is comparable across rounds
    spin_nominal = float(
        os.environ.get("SPARK_GRAFT_SPIN_NOMINAL", "0.20")
    )
    load_proxy = round(statistics.median(spin_obs) / spin_nominal, 2)

    # parallel stretch (round 10): the single-thread spin cannot see
    # HOST-level CPU oversubscription that throttles 32-thread stages
    # while one spin thread still runs near-nominal (observed r10:
    # load_proxy 1.08 with every untouched query uniformly +25-30%).
    # Run cpu_count/2 concurrent spin PROCESSES (fork — real
    # parallelism, no GIL), capped at 16: asking for at most half the
    # advertised CPUs means a fairly-scheduled idle box completes them
    # in ~one spin wall (+pool overhead, idle ratio ~1.1-1.5 measured
    # on this 32-vCPU box) REGARDLESS of core count, so the ratio
    # stays self-calibrating — no idle-box constant needed; under host
    # contention it stretches toward the oversubscription factor. The
    # proc count rides the JSON so readers on other shapes can judge.
    import multiprocessing as _mp

    # ADVICE r10: on a 1-3 vCPU host the "half the CPUs" premise breaks
    # (2 forced procs on 2 cores measure ~2x even idle, reading as
    # phantom contention) — record the probe as n/a there instead of a
    # misleading number; the single-thread load_proxy still reports.
    n_cpus = os.cpu_count() or 2
    mt_procs = min(16, n_cpus // 2) if n_cpus >= 4 else 0

    def _mt_sample(procs: int = mt_procs) -> float:
        # spawn, not fork: forking a live PySpark driver (JVM + py4j
        # threads that may hold locks at fork time) can intermittently
        # deadlock the child; _spin_worker is module-level, so spawn
        # pickles it cleanly, and Pool creation sits outside the timed
        # region so the slower spawn startup never biases mt_wall
        ctx = _mp.get_context("spawn")
        with ctx.Pool(procs) as pool:
            t0 = time.perf_counter()
            pool.map(_spin_worker, [2_000_000] * procs)
            return time.perf_counter() - t0

    if mt_procs:
        mt_wall = min(_mt_sample() for _ in range(2))
        parallel_stretch = round(
            mt_wall / statistics.median(spin_obs), 2
        )
    else:
        mt_wall = None
        parallel_stretch = None

    # r14 (VERDICT r13 item 7): separate executor-bound from driver-bound
    # wall per query. At sf0.1 the suite is driver/overhead-bound, so
    # plan-level wins are invisible in total wall; the split makes them
    # checkable. Implementation reads the AppStatusStore (the UI's own
    # data source, live even with the UI off): for each query we take
    # the union length of its stages' [submission, completion] windows
    # ("stage_wall" — executor-occupied wall) and charge the remainder
    # of the measured wall to the driver ("driver_gap" — plan build,
    # Catalyst/AQE, codegen, scheduling gaps). task_sec is the summed
    # executorRunTime (core-seconds). ADDITIVE telemetry only: the
    # timed region, the queries dict, and the headline total are
    # unchanged; failures degrade to absent detail, never a bench error.
    def _stage_split(t0_ms: float, t1_ms: float) -> tuple[float, float]:
        gw = spark.sparkContext._gateway
        jvm = gw.jvm
        ss = spark.sparkContext._jsc.sc().statusStore()
        lst = ss.stageList(
            jvm.java.util.ArrayList(),       # all statuses
            False,                           # no task details
            False,                           # no summaries
            gw.new_array(jvm.double, 0),     # no quantiles
            jvm.java.util.ArrayList(),       # all task statuses
        )
        intervals = []
        task_ms = 0
        it = lst.iterator()
        while it.hasNext():
            s = it.next()
            sub, comp = s.submissionTime(), s.completionTime()
            if sub.isEmpty() or comp.isEmpty():
                continue
            a = sub.get().getTime()
            b = comp.get().getTime()
            if a < t0_ms or a > t1_ms:
                continue
            intervals.append((a, min(b, t1_ms)))
            task_ms += s.executorRunTime()
        intervals.sort()
        covered, cur_a, cur_b = 0.0, None, None
        for a, b in intervals:
            if cur_b is None or a > cur_b:
                if cur_b is not None:
                    covered += cur_b - cur_a
                cur_a, cur_b = a, b
            else:
                cur_b = max(cur_b, b)
        if cur_b is not None:
            covered += cur_b - cur_a
        return covered / 1000.0, task_ms / 1000.0

    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    for name in HEADLINE:
        fn = QUERIES[name].fn
        obs = []
        w0 = time.time() * 1000.0
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            obs.append(time.perf_counter() - t0)
        w1 = time.time() * 1000.0
        timings[name] = round(statistics.median(obs), 3)
        try:
            # one statusStore read per query AFTER its reps (outside the
            # timed region): the window spans all reps back-to-back, so
            # per-rep averages divide by `reps`
            stage_wall, task_sec = _stage_split(w0, w1)
            detail[name] = {
                "stage_wall": round(stage_wall / reps, 3),
                "driver_gap": round(
                    max(sum(obs) - stage_wall, 0.0) / reps, 3
                ),
                "task_sec": round(task_sec / reps, 3),
            }
        except Exception:
            pass

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "query_detail": detail or None,
                "sf": sf,
                "reps": reps,
                "stat": "median",
                "load_proxy": load_proxy,
                "spin_sec": round(statistics.median(spin_obs), 4),
                "parallel_stretch": parallel_stretch,
                "mt_wall_sec": round(mt_wall, 4) if mt_wall else None,
                "mt_procs": mt_procs,
            }
        )
    )


if __name__ == "__main__":
    main()
