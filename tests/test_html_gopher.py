"""strip_html and gopher_rules edge cases."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from solar_data_tools_spark.operators import text as tx


def _strip(spark, raw: str) -> str:
    df = spark.createDataFrame([Row(h=raw)])
    return df.select(tx.strip_html(F.col("h")).alias("t")).first()["t"]


def test_strip_html_script_with_embedded_tags(spark):
    # a </p> INSIDE a script string must not terminate the strip early
    assert (
        _strip(spark, '<p>keep</p><script>var a="</p>";</script><p>also</p>')
        == "keep also"
    )


def test_strip_html_entities_single_unescape(spark):
    # &amp;lt; unescapes to the literal text "&lt;", never to "<"
    assert _strip(spark, "<p>a &amp;lt; b</p>") == "a &lt; b"
    assert _strip(spark, "x &lt;tag&gt; &quot;q&quot; &#39;s&#39;") == \
        "x <tag> \"q\" 's'"


def test_strip_html_comments_style_whitespace(spark):
    assert (
        _strip(spark, "<!-- hidden --><style>p{}</style>A\n\n  B<br/>C")
        == "A B C"
    )
    assert _strip(spark, "") == ""
    assert _strip(spark, "no tags at all") == "no tags at all"


def test_gopher_rules_verdicts(spark):
    good = " ".join(
        ["the", "be", "to", "of", "and"] + ["word"] * 60
    )  # 65 words, mean len ~3.5, 5 required stopwords
    short = "the of tiny"  # word count under 50
    bullets = "\n".join(["- a"] * 9 + ["the be to of and " + "w " * 50])
    rows = [
        Row(doc_id=1, text=good),
        Row(doc_id=2, text=short),
        Row(doc_id=3, text=bullets),
    ]
    out = {
        r["doc_id"]: r
        for r in tx.gopher_rules(spark.createDataFrame(rows)).collect()
    }
    assert out[1]["gopher_pass"] is True
    assert out[1]["required_hits"] == 5
    assert out[2]["ok_word_count"] is False and out[2]["gopher_pass"] is False
    # 9 of 10 lines are bullets -> 0.9 ratio is still allowed (<=), and
    # the word payload keeps the other rules green
    assert out[3]["bullet_ratio"] == 0.9
    assert out[3]["ok_bullets"] is True


def test_gopher_symbol_and_ellipsis(spark):
    base = "the be to of and " + "w " * 50
    hashy = base + "#" * 20  # 20 hashes / 56 words > 0.1
    dots = "\n".join([base, "a...", "b...", "c..."])  # 3/4 lines ellipsis
    rows = [Row(doc_id=1, text=hashy), Row(doc_id=2, text=dots)]
    out = {
        r["doc_id"]: r
        for r in tx.gopher_rules(spark.createDataFrame(rows)).collect()
    }
    assert out[1]["ok_symbols"] is False
    assert out[2]["ok_ellipsis"] is False
    assert out[2]["ellipsis_ratio"] == 0.75


def test_strip_html_is_codegen_only(spark):
    df = spark.createDataFrame([Row(h="<p>x</p>")])
    out = df.select(tx.strip_html(F.col("h")).alias("t"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
