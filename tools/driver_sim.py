#!/usr/bin/env python
"""Exact simulation of the external correctness gate: a VANILLA
SparkSession built from a foreign cwd imports `__spark_entry__.py` by
path, runs `entry()` plus the first-50 window of `queries()` at sf0.01,
and compares each against its `oracle_sql()` via the same canonicalizer
the test suite uses (rows + sorted columns + dtype-honest per-column
value canonicalization — since r11 an integer-valued float64 renders
'945405.0' vs an int's '945405', so this sim fails exactly where the
driver's value hash fails; the r10 q178 incident was an iterrows
row-upcast hiding that class).

This catches the two failure classes pytest cannot (tuned session
configs, executor package imports) for EXACTLY the query set the
driver will check. Run before ending any session that touched the
registry:

    python tools/driver_sim.py            # sf0.01, window = first 50
    python tools/driver_sim.py --all      # every registered query
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true",
                    help="run every query, not just the 50-query window")
    ap.add_argument("--only", default=None,
                    help="comma-separated query-name prefixes to run "
                         "(targeted pre-commit check; overrides --all)")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    print("ENTRY rows:", mod.entry(spark).count(), flush=True)
    con = duckdb.connect()
    tables = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )
    sys.path.insert(0, REPO)
    from tests.oracle_utils import compare

    qs, osql = mod.queries(), mod.oracle_sql()
    if args.only:
        pfx = [p.strip() for p in args.only.split(",") if p.strip()]
        names = [n for n in qs if any(n.startswith(p) for p in pfx)]
    else:
        names = list(qs) if args.all else list(qs)[:50]
    fails = []
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, args.sf)
            if name in osql:
                compare(sdf, con.sql(osql[name]).df(), name)
                verdict = "ORACLE-OK"
            else:
                n = sdf.count()
                assert n >= 0 and len(sdf.schema.fields) > 0
                verdict = f"ROWS-OK({n})"
        except Exception as ex:  # noqa: BLE001 — report, don't die
            verdict = f"FAIL: {str(ex)[:160]}"
            fails.append(name)
        print(f"{name}: {verdict} [{time.perf_counter() - t0:.1f}s]",
              flush=True)
    print(json.dumps({"checked": len(names), "fails": fails}))
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
