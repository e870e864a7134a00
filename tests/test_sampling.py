"""Deterministic sampling / shuffle / packing (operators/sampling.py).

The defining property of every operator here is *partitioning
invariance*: the result depends only on row keys and the seed, never on
how the data happens to be split across tasks. Each test perturbs the
physical layout and asserts the logical result is bit-identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from solar_data_tools_spark.operators import sampling as sp
from solar_data_tools_spark.session import read_table


@pytest.fixture(scope="module")
def docs(spark, sf_medium):
    return read_table(spark, f"{sf_medium}/documents.parquet")


def test_hash_sample_partitioning_invariant(spark, docs):
    a = sorted(
        r.doc_id for r in sp.hash_sample(docs, 0.3, seed=1).select("doc_id").collect()
    )
    b = sorted(
        r.doc_id
        for r in sp.hash_sample(docs.repartition(13, "lang"), 0.3, seed=1)
        .select("doc_id")
        .collect()
    )
    assert a == b and len(a) > 0


def test_hash_sample_rate_and_seed(docs):
    n = docs.count()
    k = sp.hash_sample(docs, 0.3, seed=1).count()
    # md5 is uniform; at n=500 the binomial 5-sigma band is ~±0.1
    assert 0.2 * n < k < 0.4 * n
    k2 = sp.hash_sample(docs, 0.3, seed=2).count()
    ids1 = {r.doc_id for r in sp.hash_sample(docs, 0.3, seed=1).collect()}
    ids2 = {r.doc_id for r in sp.hash_sample(docs, 0.3, seed=2).collect()}
    assert ids1 != ids2  # seed actually changes the subset
    assert 0.2 * n < k2 < 0.4 * n


def test_hash_sample_is_nested(docs):
    """A row kept at rate r is kept at every rate >= r (same seed) —
    the property that makes incremental corpus scaling reproducible."""
    lo = {r.doc_id for r in sp.hash_sample(docs, 0.2, seed=3).collect()}
    hi = {r.doc_id for r in sp.hash_sample(docs, 0.6, seed=3).collect()}
    assert lo <= hi


def test_stratified_sample_rates(docs):
    out = sp.stratified_sample(
        docs, {"src0": 1.0, "src1": 0.0}, strata_col="source", seed=5,
        default_rate=0.5,
    )
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    n_src0 = docs.where("source = 'src0'").count()
    assert by_src.get("src0") == n_src0  # rate 1.0 keeps everything
    assert "src1" not in by_src  # rate 0.0 keeps nothing
    n_other = docs.where("source NOT IN ('src0','src1')").count()
    kept_other = sum(v for k, v in by_src.items() if k not in ("src0",))
    assert 0.3 * n_other < kept_other < 0.7 * n_other


def test_global_shuffle_rank_is_permutation(spark, docs):
    out = sp.global_shuffle_rank(docs, seed=7, num_partitions=5).select(
        "doc_id", "shuffle_rank"
    )
    rows = out.collect()
    n = docs.count()
    assert sorted(r.shuffle_rank for r in rows) == list(range(1, n + 1))
    # rank order must equal the order of the seeded hash key
    import hashlib

    def key(doc_id):
        return hashlib.md5(f"7:{doc_id}".encode()).hexdigest()

    by_rank = [r.doc_id for r in sorted(rows, key=lambda r: r.shuffle_rank)]
    expected = sorted((r.doc_id for r in rows), key=lambda d: (key(d), d))
    assert by_rank == expected


def test_global_shuffle_rank_permutation_with_payload_columns(spark):
    """Regression guard for the pruning-defeats-ReusedExchange bug: with
    a payload column, column pruning makes the count branch's exchange
    subtree differ from the rank branch's, so the old
    repartitionByRange plan sampled TWO independent sets of range
    boundaries (no ReusedExchange) and could emit duplicate/missing
    ranks at reservoir-eviction scale. The computed-bucket plan derives
    the partition id from the key itself, so it must yield an exact
    permutation regardless of payload columns or exchange reuse."""
    import pyspark.sql.functions as F

    big = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("payload-"), F.col("id")).alias("text"),
    )
    out = sp.global_shuffle_rank(big, seed=3, num_partitions=16)
    ranks = [r.shuffle_rank for r in out.select("shuffle_rank").collect()]
    assert sorted(ranks) == list(range(1, 20001))
    # and no ReusedExchange is REQUIRED for that to hold
    exec_plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in exec_plan


def test_global_shuffle_rank_partitioning_invariant(docs):
    a = {(r.doc_id, r.shuffle_rank)
         for r in sp.global_shuffle_rank(docs, seed=9, num_partitions=3).collect()}
    b = {(r.doc_id, r.shuffle_rank)
         for r in sp.global_shuffle_rank(
             docs.repartition(17), seed=9, num_partitions=8).collect()}
    assert a == b


def test_pack_sequences_invariants(docs):
    budget = 512
    out = sp.pack_sequences(docs, budget=budget, group_col="source").collect()
    assert all(0 <= r.offset_in_pack < budget for r in out)
    # reconstruct per-source streams and re-derive pack/offset locally
    from collections import defaultdict

    streams = defaultdict(list)
    for r in out:
        streams[r.source].append(r)
    for src, rows in streams.items():
        rows.sort(key=lambda r: r.doc_id)
        start = 0
        for r in rows:
            assert r.pack_id == start // budget, (src, r.doc_id)
            assert r.offset_in_pack == start % budget
            start += r.n_tokens
    # packs are contiguous: a doc's pack id never decreases along the stream
    for rows in streams.values():
        packs = [r.pack_id for r in sorted(rows, key=lambda r: r.doc_id)]
        assert packs == sorted(packs)


def test_pack_sequences_explicit_token_col(spark):
    pdf = spark.createDataFrame(
        [(i, "s", 100) for i in range(10)], "doc_id long, source string, toks long"
    )
    out = sp.pack_sequences(
        pdf, budget=250, group_col="source", token_col="toks"
    ).collect()
    got = {r.doc_id: (r.pack_id, r.offset_in_pack) for r in out}
    # starts: 0,100,200,300,... → packs 0,0,0,1,1,2,2,2,3,3
    assert [got[i][0] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    assert got[2] == (0, 200) and got[3] == (1, 50)


def test_sampling_plan_shapes(spark, docs):
    """Plan-shape guards: the sampler is a pure filter (no Exchange at
    all); the global shuffle rank never collapses to a single
    partition; packing windows by source, not globally."""
    plan = (
        sp.hash_sample(docs, 0.5, seed=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan

    rank_plan = (
        sp.global_shuffle_rank(docs, seed=1, num_partitions=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the DATA path must be partitioned by the computed key bucket; the
    # only single-partition stage allowed is the n_partitions-row
    # offsets cumsum (metadata scale), which then broadcast-joins back —
    # never the corpus itself. No rangepartitioning: the bucket is a
    # pure function of the key (no sampled boundaries to diverge).
    assert rank_plan.count("SinglePartition") <= 1
    assert "rangepartitioning" not in rank_plan
    assert "hashpartitioning(_pid" in rank_plan
    assert "BroadcastHashJoin" in rank_plan or "BroadcastNestedLoopJoin" not in rank_plan

    pack_plan = (
        sp.pack_sequences(docs, budget=512)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in pack_plan


def test_split_assign_proportions_and_stability(docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = sp.split_assign(docs, w, seed=13).groupBy("split").count().collect()
    by = {r["split"]: r["count"] for r in out}
    n = sum(by.values())
    assert n == docs.count()
    assert 0.7 * n < by.get("train", 0) < 0.9 * n
    # growth stability: the same doc gets the same split in a subset
    sub = sp.split_assign(docs.where("doc_id < 100"), w, seed=13)
    full = {r.doc_id: r.split for r in sp.split_assign(docs, w, seed=13).collect()}
    for r in sub.collect():
        assert full[r.doc_id] == r.split


def test_leakage_safe_split_keeps_dup_groups_together(spark, docs):
    out = sp.leakage_safe_split(docs, {"train": 0.5, "test": 0.5}, seed=3)
    joined = docs.select("doc_id", "text").join(out, "doc_id").toPandas()
    by_text = joined.groupby(joined.text.str.strip().str.lower()).split.nunique()
    assert (by_text == 1).all()
    assert set(joined.split.unique()) == {"train", "test"}
    assert len(joined) == docs.count()


def test_top_k_sample_plan_and_determinism(docs):
    out = sp.top_k_sample(docs, k=50, seed=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in sp.top_k_sample(docs.repartition(7), k=50, seed=1).collect()
    )
    assert a == b and len(a) == 50


def test_budget_mix_hits_budgets_and_keeps_unbudgeted(docs):
    out = sp.budget_mix(docs, {"src0": 500.0, "src1": 1200.0}).cache()
    kept = {
        r["source"]: (r["tok"], r["n"])
        for r in out.groupBy("source")
        .agg(F.sum("n_tokens").alias("tok"), F.count("*").alias("n"))
        .collect()
    }
    totals = {
        r["source"]: (r["tok"], r["n"])
        for r in docs.groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "))).alias("tok"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    # budgeted strata: realized tokens concentrate on the budget
    # (binomial; ~25 docs/source at sf0.01, so allow a wide band)
    for src, budget in [("src0", 500.0), ("src1", 1200.0)]:
        realized = kept.get(src, (0, 0))[0]
        assert realized < totals[src][0]  # actually sampled down
        assert realized < 3 * budget
    # unbudgeted strata keep every row
    for src, (tok, n) in totals.items():
        if src not in ("src0", "src1"):
            assert kept[src][1] == n
    out.unpersist()


def test_budget_mix_partitioning_invariant(docs):
    a = sorted(
        r.doc_id
        for r in sp.budget_mix(docs, {"src0": 500.0}).select("doc_id").collect()
    )
    b = sorted(
        r.doc_id
        for r in sp.budget_mix(docs.repartition(17, "lang"), {"src0": 500.0})
        .select("doc_id")
        .collect()
    )
    assert a == b and len(a) > 0


def test_ffd_packing_invariants_and_reference_parity(spark):
    """FFD bin packing: every doc packed exactly once, no bin over
    budget (except dedicated oversize bins), assignment matches a pure-
    Python FFD reference exactly, and is invariant to input
    partitioning."""
    import random

    from solar_data_tools_spark.operators.sampling import pack_sequences_ffd

    rng = random.Random(5)
    rows = [
        (i, " ".join("w" for _ in range(rng.randint(1, 120))))
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    budget = 100
    out = pack_sequences_ffd(docs, budget=budget, n_buckets=8).collect()
    assert len(out) == 300 and len({r["doc_id"] for r in out}) == 300
    # capacity invariant
    fill: dict[int, int] = {}
    for r in out:
        if r["oversize"]:
            assert r["n_tokens"] > budget
            continue
        fill[r["pack_id"]] = fill.get(r["pack_id"], 0) + r["n_tokens"]
    assert all(v <= budget for v in fill.values())
    # oversize docs never share their bin
    packs_oversize = {r["pack_id"] for r in out if r["oversize"]}
    for r in out:
        if not r["oversize"]:
            assert r["pack_id"] not in packs_oversize

    # exact parity with an independent FFD reference per bucket
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, members in by_bucket.items():
        members_sorted = sorted(
            members, key=lambda r: (-r["n_tokens"], r["doc_id"])
        )
        bins = []
        expected = {}
        for r in members_sorted:
            t = r["n_tokens"]
            if t > budget:
                expected[r["doc_id"]] = len(bins)
                bins.append(0)
                continue
            for b in range(len(bins)):
                if bins[b] >= t:
                    expected[r["doc_id"]] = b
                    bins[b] -= t
                    break
            else:
                expected[r["doc_id"]] = len(bins)
                bins.append(budget - t)
        for r in members:
            assert r["pack_id"] == (bucket << 32) | expected[r["doc_id"]]

    # partitioning invariance
    out2 = pack_sequences_ffd(
        docs.repartition(13), budget=budget, n_buckets=8
    ).collect()
    assert {(r["doc_id"], r["pack_id"]) for r in out2} == {
        (r["doc_id"], r["pack_id"]) for r in out
    }


def test_global_shuffle_rank_permutation_at_reservoir_scale(spark):
    """Regression guard for the two-job range-boundary bug: with enough
    rows per partition that repartitionByRange's reservoir sampling
    actually evicts (its seed involves the RDD id, which differs between
    separately executed jobs), offsets collected in one job against a
    window run in another produced duplicate/missing ranks. The
    single-plan cumsum-broadcast version must yield an exact permutation
    at this scale, every execution."""
    big = spark.range(20000).withColumnRenamed("id", "doc_id")
    for _ in range(2):
        out = sp.global_shuffle_rank(big, seed=3, num_partitions=16)
        ranks = [r.shuffle_rank for r in out.select("shuffle_rank").collect()]
        assert sorted(ranks) == list(range(1, 20001))


def test_temperature_sample_rates_and_distribution(spark):
    """alpha=1 keeps everything; alpha<1: the smallest stratum keeps
    rate 1.0, rates decrease with stratum size, and the kept
    distribution is flatter than the input (the operator's purpose)."""
    import math

    from solar_data_tools_spark.operators.sampling import temperature_sample

    rows = (
        [(i, "big") for i in range(900)]
        + [(i + 900, "mid") for i in range(300)]
        + [(i + 1200, "small") for i in range(100)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    all_kept = temperature_sample(docs, alpha=1.0).toPandas()
    assert all_kept["kept"].all() and (all_kept["rate"] == 1.0).all()

    out = temperature_sample(docs, alpha=0.3).toPandas()
    rates = out.groupby("lang")["rate"].first()
    assert rates["small"] == 1.0
    assert rates["small"] > rates["mid"] > rates["big"]
    assert rates["big"] == pytest.approx((900 / 100) ** (-0.7), abs=1e-6)
    kept = out[out["kept"]].groupby("lang").size()
    # kept ratio big/small must shrink from 9x toward 9^0.3 ~ 1.9x
    assert kept["big"] / kept["small"] < 4.0
    # partitioning invariance of the exact kept set
    out2 = temperature_sample(docs.repartition(13), alpha=0.3).toPandas()
    assert set(out[out["kept"]]["doc_id"]) == set(
        out2[out2["kept"]]["doc_id"]
    )
    with pytest.raises(ValueError):
        temperature_sample(docs, alpha=0.0)


def test_weighted_shuffle_rank_semantics(spark):
    """Efraimidis-Spirakis: ranks are a dense permutation, heavier
    strata concentrate toward the front, the order is partitioning-
    invariant, and equal weights degrade to an unweighted shuffle."""
    from solar_data_tools_spark.operators.sampling import (
        weighted_shuffle_rank,
    )

    rows = [(i, "heavy" if i < 300 else "light") for i in range(600)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = weighted_shuffle_rank(
        docs, {"heavy": 8.0, "light": 1.0}, seed=4
    ).toPandas()
    assert sorted(out["rank"]) == list(range(1, 601))
    front = out[out["rank"] <= 100]
    assert (front["source"] == "heavy").mean() > 0.75
    out2 = weighted_shuffle_rank(
        docs.repartition(17), {"heavy": 8.0, "light": 1.0}, seed=4
    ).toPandas()
    a = out.sort_values("rank")["doc_id"].tolist()
    b = out2.sort_values("rank")["doc_id"].tolist()
    assert a == b
    import pytest as _pt

    with _pt.raises(ValueError):
        weighted_shuffle_rank(docs, {"heavy": 0.0})


def test_temperature_sample_null_stratum_not_dropped(spark):
    from solar_data_tools_spark.operators.sampling import temperature_sample

    rows = [(i, "big" if i < 90 else None) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(docs, alpha=0.3).toPandas()
    assert len(out) == 100  # null-stratum rows survive as their own group
    nulls = out[out["lang"].isna()]
    assert len(nulls) == 10 and (nulls["rate"] == 1.0).all()  # smallest


def test_epoch_mix_semantics(spark):
    """floor(w) guaranteed copies + probabilistic fractional copy;
    factors < 1 subsample; epoch counters are 1..n; deterministic
    under repartitioning."""
    from solar_data_tools_spark.operators.sampling import epoch_mix

    docs = spark.createDataFrame(
        [(i, "wiki" if i % 2 else "web") for i in range(400)],
        "doc_id long, source string",
    )
    out = epoch_mix(docs, {"wiki": 2.25, "web": 0.5}, seed=9).toPandas()
    per_doc = out.groupby("doc_id").epoch.agg(["count", "max"])
    assert (per_doc["count"] == per_doc["max"]).all()  # epochs are 1..n
    wiki = out[out.source == "wiki"].groupby("doc_id").size()
    assert wiki.isin([2, 3]).all()          # floor 2, maybe +1
    assert 200 * 2 < wiki.sum() < 200 * 3   # expectation ~2.25 each
    web = out[out.source == "web"].groupby("doc_id").size()
    assert (web == 1).all()                 # kept docs appear once
    assert 0 < len(web) < 200               # ~50% subsample

    again = (
        epoch_mix(docs.repartition(13), {"wiki": 2.25, "web": 0.5}, seed=9)
        .toPandas()
    )
    a = sorted(map(tuple, out[["doc_id", "epoch"]].to_numpy()))
    b = sorted(map(tuple, again[["doc_id", "epoch"]].to_numpy()))
    assert a == b


def test_token_budget_cut_exact_prefix(spark):
    """The bucketed two-level cut must equal the naive global prefix:
    walk (quality DESC, hash, id), keep while inclusive cumsum <=
    budget — verified against a pandas replay, plus edge cases (budget
    covers everything; budget smaller than the first doc)."""
    import numpy as np

    from solar_data_tools_spark.operators.sampling import (
        hash_uniform,
        token_budget_cut,
    )

    rows = [(i, i % 7, 10 + i % 13) for i in range(300)]
    docs = spark.createDataFrame(
        rows, "doc_id long, quality int, n_tokens long"
    )
    u = {
        r["doc_id"]: r["u"]
        for r in docs.select(
            "doc_id", hash_uniform(F.col("doc_id"), 5).alias("u")
        ).collect()
    }
    order = sorted(rows, key=lambda r: (-r[1], u[r[0]], r[0]))
    cum, expect = 0, set()
    budget = 1500
    for did, q, nt in order:
        cum += nt
        if cum <= budget:
            expect.add(did)
    got = {
        r["doc_id"]
        for r in token_budget_cut(
            docs, budget=budget, quality_col="quality", seed=5
        ).collect()
    }
    assert got == expect and 0 < len(got) < 300

    everything = token_budget_cut(
        docs, budget=10**9, quality_col="quality", seed=5
    ).count()
    assert everything == 300
    nothing = token_budget_cut(
        docs, budget=5, quality_col="quality", seed=5
    ).count()
    assert nothing == 0


def test_token_budget_cut_partitioning_invariant(spark):
    from solar_data_tools_spark.operators.sampling import token_budget_cut

    rows = [(i, i % 5, 7 + i % 11) for i in range(400)]
    docs = spark.createDataFrame(
        rows, "doc_id long, quality int, n_tokens long"
    )
    a = {
        r["doc_id"]
        for r in token_budget_cut(
            docs.coalesce(1), budget=900, quality_col="quality"
        ).collect()
    }
    b = {
        r["doc_id"]
        for r in token_budget_cut(
            docs.repartition(16), budget=900, quality_col="quality"
        ).collect()
    }
    assert a == b and len(a) > 0
