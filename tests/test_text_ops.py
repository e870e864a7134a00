"""Text-operator unit tests (BM25 retrieval and friends)."""

from __future__ import annotations

import pytest


def test_bm25_known_ranking(spark):
    """The doc matching BOTH query terms outranks docs repeating a
    single term (BM25's tf saturation at work); a doc sharing no query
    term never appears in the candidate set (inverted-index
    semantics)."""
    from solar_data_tools_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "common words fill this document common common"),
            (2, "rareterm appears here with common words"),
            (3, "totally unrelated content nothing shared"),
            (4, "rareterm rareterm heavy document"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "rareterm"), (0, "common")], "query_id long, term string"
    )
    out = bm25_topk(docs, q, k=4).orderBy("rank").collect()
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids                 # no shared term -> never scored
    assert ids[0] == 2                  # matches both terms -> rank 1
    assert set(ids) == {1, 2, 4}
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["score"] > out[-1]["score"]


def test_bm25_partitioning_invariant_scores(spark, sf_small):
    """Integer fixed-point contribution sums: scores are BIT-equal
    between a 1-partition and a 16-partition run (the q143 recipe)."""
    import numpy as np

    from pyspark.sql import functions as F

    from solar_data_tools_spark.operators.dedup import normalize_text
    from solar_data_tools_spark.operators.text import bm25_topk
    from solar_data_tools_spark.session import read_table

    docs = read_table(spark, f"{sf_small}/documents.parquet")
    qt = (
        docs.where(F.col("doc_id") < 2)
        .select(
            F.col("doc_id").alias("query_id"),
            F.posexplode(
                F.split(normalize_text(F.col("text")), " ")
            ).alias("pos", "term"),
        )
        .where((F.col("pos") < 5) & (F.length("term") > 0))
        .select("query_id", "term")
    )
    a = (
        bm25_topk(docs.coalesce(1), qt, k=20)
        .orderBy("query_id", "rank").toPandas()
    )
    b = (
        bm25_topk(docs.repartition(16), qt, k=20)
        .orderBy("query_id", "rank").toPandas()
    )
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert (
        a["score"].to_numpy().view(np.int64)
        == b["score"].to_numpy().view(np.int64)
    ).all()


def test_cms_one_sided_and_mergeable(spark, sf_small):
    """CMS invariants: estimates never undercount (one-sided error),
    and the sketch of a union equals the elementwise sum of the parts'
    sketches — the mergeability that makes it a distributed aggregate."""
    from pyspark.sql import functions as F

    from solar_data_tools_spark.operators.dedup import normalize_text
    from solar_data_tools_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from solar_data_tools_spark.session import read_table

    docs = read_table(spark, f"{sf_small}/documents.parquet")
    cms = cms_build(docs, width=256, depth=4, seed=2)
    truth = (
        docs.select(
            F.explode(
                F.split(normalize_text(F.col("text")), " ")
            ).alias("token")
        )
        .where(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count("*").alias("true_cnt"))
    )
    est = cms_estimate(cms, truth, width=256, depth=4, seed=2)
    j = truth.join(est, "token").toPandas()
    assert (j.cms_cnt >= j.true_cnt).all()
    # mergeability: sum of the halves' sketches == the whole's sketch
    a = cms_build(docs.where(F.col("doc_id") % 2 == 0), width=256,
                  depth=4, seed=2)
    b = cms_build(docs.where(F.col("doc_id") % 2 == 1), width=256,
                  depth=4, seed=2)
    merged = (
        a.unionByName(b).groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(docs, width=256, depth=4, seed=2)
    diff = (
        merged.join(whole, ["d", "bucket"], "full")
        .where(
            F.coalesce(merged["cnt"], F.lit(0))
            != F.coalesce(whole["cnt"], F.lit(0))
        )
        .count()
    )
    assert diff == 0


def test_rrf_fusion_semantics(spark):
    """A doc ranked well by BOTH systems outranks docs each system
    ranks alone; scores are exactly 1/(60+r_a) + 1/(60+r_b)."""
    from solar_data_tools_spark.operators.text import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)],
        "query_id long, doc_id long, rank int",
    )
    out = {r["doc_id"]: r for r in rrf_fuse(a, b, k=10).collect()}
    assert out[11]["rank"] == 1  # in both lists
    assert out[11]["rrf_score"] == 1.0 / 62 + 1.0 / 61
    assert out[10]["rrf_score"] == 1.0 / 61
    assert set(out) == {10, 11, 12, 13}


def test_novelty_scores_planted(spark):
    """Two identical docs share every gram (dup_frac 1); a unique doc
    shares none (dup_frac 0)."""
    from solar_data_tools_spark.operators.text import novelty_scores

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in novelty_scores(docs, n=4).collect()}
    assert out[1]["dup_frac"] == 1.0 and out[2]["dup_frac"] == 1.0
    assert out[3]["dup_frac"] == 0.0
    assert out[3]["n_grams_distinct"] == 2  # 5 tokens -> two 4-grams


def test_source_overlap_planted(spark):
    """Disjoint sources overlap 0; a source repeating another's text
    overlaps 1; the half-shared pair lands exactly at its Jaccard."""
    from solar_data_tools_spark.operators.text import source_overlap

    docs = spark.createDataFrame(
        [
            (1, "a", "one two three four"),
            (2, "b", "one two three four"),     # b == a
            (3, "c", "five six seven eight"),   # disjoint from a/b
            (4, "d", "one two three nine"),     # shares 1 of a's 2 grams? n=3
        ],
        "doc_id long, source string, text string",
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap(docs, n=3).collect()
    }
    assert out[("a", "b")]["jaccard"] == 1.0
    assert ("a", "c") not in out  # zero common grams -> no row
    ad = out[("a", "d")]
    # a: {one two three, two three four}; d: {one two three, two three nine}
    assert ad["n_common"] == 1 and ad["n_a"] == 2 and ad["n_b"] == 2
    assert ad["jaccard"] == pytest.approx(1.0 / 3.0)


def test_minhash_source_overlap_tracks_exact(spark, sf_small):
    """The 64-hash per-source MinHash Jaccard estimate (q167) must land
    within 4 standard errors (se = sqrt(J(1-J)/64) <= 0.0625) of q166's
    exact gram-set Jaccard for every source pair — the accuracy contract
    that justifies the sketch as the 100 TB path."""
    from solar_data_tools_spark.registry import QUERIES

    exact = {
        (r["source_a"], r["source_b"]): r["jaccard"]
        for r in QUERIES["q166_source_overlap"].fn(
            spark, sf_small
        ).collect()
    }
    est = {
        (r["source_a"], r["source_b"]): r["est_jaccard"]
        for r in QUERIES["q167_source_overlap_minhash"].fn(
            spark, sf_small
        ).collect()
    }
    assert len(est) > 0
    checked = 0
    for pair, j_est in est.items():
        j = exact.get(pair, 0.0)
        se = max((j * (1 - j) / 64.0) ** 0.5, 1e-9)
        assert abs(j_est - j) <= max(4 * se, 0.08), (pair, j, j_est)
        checked += 1
    assert checked == len(est)


def test_streaming_cms_matches_batch(spark, sf_small, tmp_path):
    """The CMS is a bounded additive aggregate: the streaming grid after
    ingesting the whole corpus equals cms_build's batch grid exactly —
    watermark-free stateful aggregation whose state is capped at
    depth*width rows forever."""
    from pyspark.sql import functions as F

    from solar_data_tools_spark.operators.sketches import cms_build
    from solar_data_tools_spark.session import read_table
    from solar_data_tools_spark.streaming import streaming_cms

    docs = read_table(spark, f"{sf_small}/documents.parquet").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "cms_stream")
    docs.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        src
    )
    q = (
        streaming_cms(stream, width=256, depth=4, seed=2)
        .writeStream.format("memory")
        .queryName("cms_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in spark.sql("select * from cms_stream_test").collect()
    }
    batch = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_build(docs, width=256, depth=4, seed=2).collect()
    }
    assert streamed == batch and len(batch) > 0
