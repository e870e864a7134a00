"""JSONL corpus ingest (sources.readers.read_documents_jsonl): the
roundtrip + quarantine contract, certified the same way as the S1 CSV
scan (roundtrip test; no registry query — the operator is a source, its
input is not one of the sf-dir tables).

The corruption classes planted here are the ones measured on this Spark
version (see the reader's docstring): invalid JSON, non-object
top-level, per-field type mismatch — all must QUARANTINE with the raw
line; valid objects with missing fields must be ACCEPTED with NULLs;
blank lines must vanish from both sides.
"""

from __future__ import annotations

import json

import pytest

from solar_data_tools_spark.sources.readers import read_documents_jsonl

SCHEMA = "doc_id long, text string, lang string"

GOOD = [
    {"doc_id": 1, "text": "alpha beta", "lang": "en"},
    {"doc_id": 2, "text": "gamma", "lang": "de"},
    {"doc_id": 3, "text": "delta"},            # missing field -> NULL
    {"doc_id": 4, "text": "eps", "lang": None, "extra": 9},  # extra ignored
]
BAD = [
    '{"doc_id": 5, "text": "trunca',            # invalid JSON
    "not json at all",                           # invalid JSON
    "[1, 2, 3]",                                 # non-object top level
    '{"doc_id": "NaN-ish", "text": "x"}',        # type mismatch on long
]


def _write_corpus(tmp_path) -> str:
    src = tmp_path / "jsonl_src"
    src.mkdir()
    lines = [json.dumps(g) for g in GOOD[:2]] + [BAD[0], "", BAD[1]]
    (src / "part-0.jsonl").write_text("\n".join(lines) + "\n")
    lines2 = [json.dumps(g) for g in GOOD[2:]] + [BAD[2], "   ", BAD[3]]
    (src / "part-1.jsonl").write_text("\n".join(lines2) + "\n")
    return str(src)


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    docs, quarantine = read_documents_jsonl(spark, _write_corpus(tmp_path), SCHEMA)

    assert docs.columns == ["doc_id", "text", "lang"]
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in docs.collect()}
    assert got == {
        1: ("alpha beta", "en"),
        2: ("gamma", "de"),
        3: ("delta", None),
        4: ("eps", None),
    }
    # every bad line lands in quarantine VERBATIM; blanks vanish
    assert sorted(r["raw_line"] for r in quarantine.collect()) == sorted(BAD)


def test_jsonl_streaming_face_matches_batch(spark, tmp_path):
    """streaming=True must parse identically (from_json is row-local,
    parity by construction — this pins it against reader drift)."""
    src = _write_corpus(tmp_path)
    docs_b, quar_b = read_documents_jsonl(spark, src, SCHEMA)
    docs_s, quar_s = read_documents_jsonl(spark, src, SCHEMA, streaming=True)
    for name, sdf in (("docs", docs_s), ("quar", quar_s)):
        q = (
            sdf.writeStream.format("memory")
            .queryName(f"jsonl_{name}_stream_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    stream_docs = spark.sql("select * from jsonl_docs_stream_test")
    assert sorted(map(tuple, stream_docs.collect())) == sorted(
        map(tuple, docs_b.collect())
    )
    stream_quar = spark.sql("select * from jsonl_quar_stream_test")
    assert sorted(r["raw_line"] for r in stream_quar.collect()) == sorted(
        r["raw_line"] for r in quar_b.collect()
    )


def test_jsonl_reserved_corrupt_column_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_documents_jsonl(
            spark, str(tmp_path), "doc_id long, _corrupt_record string"
        )


def test_jsonl_single_scan_plan(spark, tmp_path):
    """Both outputs must hang off ONE text scan + one JsonToStructs
    projection — no spark.read.json inference pass, no Python eval."""
    docs, quarantine = read_documents_jsonl(spark, _write_corpus(tmp_path), SCHEMA)
    for df in (docs, quarantine):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "from_json" in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_jsonl_gzip_path(spark, tmp_path):
    """.gz JSONL reads transparently through the same text scan (the
    docstring's caveat is about SPLITTABILITY — one task per .gz file —
    not readability)."""
    import gzip

    src = tmp_path / "jsonl_gz"
    src.mkdir()
    lines = [json.dumps(g) for g in GOOD[:2]] + [BAD[0]]
    with gzip.open(src / "part-0.jsonl.gz", "wt") as f:
        f.write("\n".join(lines) + "\n")
    docs, quarantine = read_documents_jsonl(spark, str(src), SCHEMA)
    assert {r["doc_id"] for r in docs.collect()} == {1, 2}
    assert [r["raw_line"] for r in quarantine.collect()] == [BAD[0]]


def test_jsonl_training_shard_roundtrip(spark, tmp_path):
    """Sink->source composition: write_training_shards(fmt='json')
    emits sharded JSONL a trainer consumes; read_documents_jsonl must
    read the whole shard tree back losslessly (zero quarantine)."""
    from solar_data_tools_spark.sources.readers import (
        write_training_shards,
    )

    df = spark.range(100).selectExpr(
        "id as doc_id", "concat('text-', id) as text", "'en' as lang"
    )
    out = str(tmp_path / "jsonl_shards")
    n_shards = write_training_shards(
        df, out, rows_per_shard=32, fmt="json"
    )
    assert n_shards == 4
    docs, quarantine = read_documents_jsonl(
        spark, out + "/shard=*/", SCHEMA
    )
    assert quarantine.count() == 0
    got = sorted(
        (r["doc_id"], r["text"], r["lang"]) for r in docs.collect()
    )
    assert got == [(i, f"text-{i}", "en") for i in range(100)]
