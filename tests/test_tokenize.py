"""BPE tokenizer tests: hand-computed training golden, sequential-apply
parity, decode round-trip, partitioning invariance, and cross-engine
determinism of the trained merge list."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from solar_data_tools_spark.operators import tokenize as tk


def test_train_golden_tiny_corpus(spark):
    """Hand-derivable 2-word corpus: 'ab' x3 + 'ac' x1.
    Pair counts round 1: (a,b)=3, (b,</w>)=3, (a,c)=1, (c,</w>)=1 —
    tie at 3 breaks lexicographically to ('a','b').
    Round 2: words are ('ab','</w>') x3, ('a','c','</w>') x1 →
    (ab,</w>)=3 wins. Round 3: ('a','c')=1 ties ('c','</w>')=1 →
    ('a','c'). Round 4: ('ac','</w>')."""
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="ab ab ab ac")]
    )
    merges = tk.train_bpe_merges(docs, n_merges=10, sample_cap=10)
    assert merges == [
        ("a", "b"),
        ("ab", tk.END),
        ("a", "c"),
        ("ac", tk.END),
    ]  # exhausts after 4 — no 5th merge exists


def test_encode_word_matches_sequential_apply(spark, sf_small):
    """Lowest-rank-first (the GPT-2 apply loop) must equal applying the
    trained merges sequentially in rank order — the defining equivalence
    for merge lists produced by BPE training."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    merges = tk.train_bpe_merges(docs, n_merges=120, sample_cap=64)
    ranks = {p: i for i, p in enumerate(merges)}

    def sequential(word):
        sym = list(word) + [tk.END]
        for a, b in merges:
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    sample = [
        w
        for r in docs.limit(40).collect()
        for w in r["text"].lower().split()
    ]
    assert sample
    for w in set(sample):
        assert tk.encode_word(w, ranks) == sequential(w), w


def test_encode_roundtrip_and_counts(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(50)
    merges = tk.train_bpe_merges(docs, n_merges=80, sample_cap=50)
    enc = tk.bpe_encode(docs, merges).orderBy("doc_id").collect()
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in enc:
        toks = r["tokens"]
        assert r["n_tokens"] == len(toks)
        # detokenize: every word ends with exactly one END sentinel
        words = "".join(toks).split(tk.END)
        assert words[-1] == ""
        words = words[:-1]
        assert words == " ".join(src[r["doc_id"]].lower().split()).split()


def test_training_and_encode_partitioning_invariant(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    m1 = tk.train_bpe_merges(docs, n_merges=60, sample_cap=100)
    m2 = tk.train_bpe_merges(
        docs.repartition(13), n_merges=60, sample_cap=100
    )
    assert m1 == m2
    e1 = (
        tk.bpe_encode(docs.limit(30), m1)
        .orderBy("doc_id")
        .toPandas()
    )
    e2 = (
        tk.bpe_encode(docs.limit(30).repartition(7), m1)
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(e1["n_tokens"]) == list(e2["n_tokens"])
    assert [list(t) for t in e1["tokens"]] == [list(t) for t in e2["tokens"]]


def test_merges_compress(spark, sf_small):
    """More merges -> fewer tokens (monotone compression), and any
    trained tokenizer beats character splitting."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(100)
    m0 = tk.train_bpe_merges(docs, n_merges=20, sample_cap=100)
    m1 = tk.train_bpe_merges(docs, n_merges=200, sample_cap=100)
    n0 = tk.bpe_encode(docs, m0).agg(F.sum("n_tokens")).collect()[0][0]
    n1 = tk.bpe_encode(docs, m1).agg(F.sum("n_tokens")).collect()[0][0]
    nchars = docs.select(
        F.sum(F.length(F.regexp_replace(F.lower("text"), r"\s+", "")))
    ).collect()[0][0]
    assert n1 < n0 < nchars


def test_streaming_bpe_encode_matches_batch(spark, sf_small, tmp_path):
    """bpe_encode is a stateless mapInPandas projection, so it tokenizes
    at INGEST time: availableNow file stream == batch, no watermark
    state (the merge table rides in the task closure)."""
    from solar_data_tools_spark.session import read_table

    docs = read_table(spark, f"{sf_small}/documents.parquet").select(
        "doc_id", "text"
    ).limit(60)
    merges = tk.train_bpe_merges(docs, n_merges=80, sample_cap=60)
    src = str(tmp_path / "bpe_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        tk.bpe_encode(stream, merges)
        .writeStream.format("memory")
        .queryName("bpe_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in spark.sql("select * from bpe_stream_test").collect()
    }
    batch = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in tk.bpe_encode(docs, merges).collect()
    }
    assert streamed == batch and len(batch) == 60


def test_encode_detokenize_fixpoint(spark, sf_small):
    """Detokenizing (join tokens, strip sentinels) reproduces the
    normalized text exactly, so re-encoding it is a fixpoint — the
    property that makes token counts stable across pipeline re-runs."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(30)
    merges = tk.train_bpe_merges(docs, n_merges=100, sample_cap=30)
    first = tk.bpe_encode(docs, merges).orderBy("doc_id").collect()
    detok = spark.createDataFrame(
        [
            (r["doc_id"], " ".join("".join(r["tokens"]).split(tk.END)[:-1]))
            for r in first
        ],
        "doc_id long, text string",
    )
    second = tk.bpe_encode(detok, merges).orderBy("doc_id").collect()
    assert [
        (r["doc_id"], list(r["tokens"])) for r in first
    ] == [(r["doc_id"], list(r["tokens"])) for r in second]


def test_encode_string_doc_ids(spark):
    """The mapInPandas schema derives the id type from the input, so
    non-long ids (e.g. WARC record ids) pass through unchanged."""
    docs = spark.createDataFrame(
        [("warc-a", "the cat sat"), ("warc-b", "the dog ran")],
        "doc_id string, text string",
    )
    merges = tk.train_bpe_merges(docs, n_merges=10, sample_cap=2)
    out = tk.bpe_encode(docs, merges).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == ["warc-a", "warc-b"]
    assert all(r["n_tokens"] > 0 for r in out)
