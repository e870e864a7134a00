

def test_dedup_lines_within_doc_semantics(spark):
    """First occurrence kept in order; short units always kept (the
    line_dedup short-line rule); zero-shuffle plan (stream-legal)."""
    from solar_data_tools_spark.operators.dedup import (
        dedup_lines_within_doc,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha\ngamma\nbeta"),
            (2, "x\nlong line here\nx\nlong line here"),
            (3, "unique only"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines_within_doc(
        docs, min_line_chars=4
    ).collect()}
    assert out[1]["text"] == "alpha\nbeta\ngamma"
    assert out[1]["n_lines"] == 5 and out[1]["n_dropped"] == 2
    # 'x' is below min_line_chars -> both kept; the long line dedupes
    assert out[2]["text"] == "x\nlong line here\nx"
    assert out[2]["n_dropped"] == 1
    assert out[3]["text"] == "unique only" and out[3]["n_dropped"] == 0

    plan = (
        dedup_lines_within_doc(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_within_doc_dedup_streaming_matches_batch(spark, tmp_path):
    """dedup_lines_within_doc is a stateless narrow projection — an
    availableNow stream rebuilds byte-identical texts to the batch
    path (ingest-time within-doc boilerplate suppression)."""
    from solar_data_tools_spark.operators.dedup import (
        dedup_lines_within_doc,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{j % 5}" for j in range(i % 9 + 2)))
         for i in range(40)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "withindoc_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        dedup_lines_within_doc(stream, sep=" ", min_line_chars=1)
        .writeStream.format("memory")
        .queryName("withindoc_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_dropped"])
        for r in spark.sql("select * from withindoc_stream_test").collect()
    }
    batch = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_dropped"])
        for r in dedup_lines_within_doc(
            docs, sep=" ", min_line_chars=1
        ).collect()
    }
    assert streamed == batch and len(batch) == 40


def test_within_doc_dedup_engines_identical(spark, sf_small):
    from solar_data_tools_spark.operators.dedup import (
        dedup_lines_within_doc,
    )
    from solar_data_tools_spark.session import read_table

    docs = read_table(spark, f"{sf_small}/documents.parquet").limit(200)
    a = (
        dedup_lines_within_doc(docs, sep=" ", min_line_chars=1,
                               engine="expr")
        .orderBy("doc_id").toPandas()
    )
    b = (
        dedup_lines_within_doc(docs, sep=" ", min_line_chars=1,
                               engine="pandas")
        .orderBy("doc_id").toPandas()
    )
    for c in a.columns:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
