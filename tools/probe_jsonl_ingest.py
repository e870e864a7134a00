#!/usr/bin/env python
"""Probe: JSONL ingest throughput (sources.readers.read_documents_jsonl).

Synthesizes a JSONL corpus cluster-side (documents-shaped rows, ~1%
planted corrupt lines interleaved), writes it as uncompressed sharded
.jsonl, then times:

  * parse+split — full docs materialization (noop write) + quarantine
    count off the shared scan. The number that matters at 100 TB is
    lines/sec/core: the parse is one JsonToStructs projection, so it
    should track text-scan bandwidth, not shuffle anything.

Usage:
    python tools/probe_jsonl_ingest.py --docs 2000000
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
import os

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    args = ap.parse_args()

    from solar_data_tools_spark.session import get_spark
    from solar_data_tools_spark.sources.readers import read_documents_jsonl

    spark = get_spark(app_name="sdt-jsonl-ingest-probe")
    spark.sparkContext.setLogLevel("ERROR")
    n = args.docs

    # documents-shaped lines, built JVM-side; every 100th line is
    # corrupt (truncated JSON) so the quarantine leg does real work
    doc_len, vocab_n = 40, 500
    vocab = ", ".join(f"'w{i}'" for i in range(vocab_n))
    text = F.expr(
        f"concat_ws(' ', transform(sequence(1, {doc_len}), "
        f"i -> element_at(array({vocab}), "
        f"cast(abs(xxhash64(id, i)) % {vocab_n} as int) + 1)))"
    )
    line = F.to_json(
        F.struct(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.concat(F.lit("l"), F.col("id") % 5).alias("lang"),
        )
    )
    corrupt = F.col("id") % 100 == 0
    lines = spark.range(n).select(
        F.when(corrupt, F.substring(line, 1, 25)).otherwise(line).alias(
            "value"
        )
    )

    src = tempfile.mkdtemp(prefix="jsonl_probe_")
    try:
        lines.repartition(32).write.mode("overwrite").text(src)
        size_mb = sum(
            f.stat().st_size
            for f in __import__("pathlib").Path(src).rglob("*")
            if f.is_file()
        ) / 1e6

        t0 = time.perf_counter()
        docs, quarantine = read_documents_jsonl(
            spark, src, "doc_id long, text string, lang string"
        )
        docs.write.format("noop").mode("overwrite").save()
        n_quar = quarantine.count()
        wall = round(time.perf_counter() - t0, 2)
        expected = -(-n // 100)  # ids 0,100,... in [0, n)
        assert n_quar == expected, (n_quar, expected)
        print(json.dumps({
            "probe": "jsonl_ingest",
            "lines": n,
            "corpus_mb": round(size_mb, 1),
            "quarantined": n_quar,
            "parse_split_sec": wall,
            "lines_per_sec": int(n / wall),
            "mb_per_sec": round(size_mb / wall, 1),
        }))
    finally:
        shutil.rmtree(src, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
