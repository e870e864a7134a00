

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
