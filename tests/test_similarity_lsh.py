"""lsh_topk: banded equi-join candidate generation.

Verifies (1) the plan contains NO BroadcastNestedLoopJoin — candidates come
from hash equi-joins on (band_ix, band_bits) buckets — and (2) results are
identical to the definition: exact cosine top-k over the corpus rows whose
signature is within max_hamming bits of the query signature (pigeonhole
recall + exact Hamming filter make the banded join lossless).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from pyspark.sql import functions as F

from solar_data_tools_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def planes():
    rng = random.Random(42)
    return [[rng.gauss(0, 1) for _ in range(64)] for _ in range(16)]


def _load(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return emb, queries


def test_plan_has_no_nested_loop_join(spark, sf_small, planes):
    emb, queries = _load(spark, sf_small)
    out = sim.lsh_topk(emb, queries, planes, k=5, max_hamming=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_banded_results_match_signature_scan_definition(spark, sf_small, planes):
    emb, queries = _load(spark, sf_small)
    max_hamming, k = 6, 5
    got = (
        sim.lsh_topk(emb, queries, planes, k=k, max_hamming=max_hamming)
        .orderBy("query_id", "rank")
        .toPandas()
    )

    # independent single-node reference: numpy signatures + full scan
    pdf = emb.toPandas()
    V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    P = np.array(planes)  # (16, 64)
    bits = (V @ P.T >= 0).astype(np.int64)  # (N, 16)
    sigs = (bits << np.arange(16)).sum(axis=1)
    qmask = ids < 5
    expected_rows = []
    for qi, qsig, qvec in zip(ids[qmask], sigs[qmask], V[qmask]):
        ham = np.array(
            [bin(int(qsig) ^ int(s)).count("1") for s in sigs]
        )
        cand = (ham <= max_hamming) & (ids != qi)
        cos = V[cand] @ qvec / (
            np.linalg.norm(V[cand], axis=1) * np.linalg.norm(qvec)
        )
        order = sorted(
            zip(-cos, ids[cand]),
        )[:k]
        for rank, (negc, vid) in enumerate(order, start=1):
            expected_rows.append((int(qi), int(vid), rank))

    got_rows = [
        (int(r.query_id), int(r.vec_id), int(r.rank)) for r in got.itertuples()
    ]
    assert sorted(got_rows) == sorted(expected_rows)


def test_band_layout_covers_all_bits():
    for n_bits, bands in [(16, 7), (64, 3), (64, 64), (16, 16), (10, 4)]:
        layout = sim._band_layout(n_bits, bands)
        covered = []
        for start, width in layout:
            assert width >= 1
            covered.extend(range(start, start + width))
        assert covered == list(range(n_bits))


def test_invalid_band_config_rejected(spark, sf_small, planes):
    emb, queries = _load(spark, sf_small)
    with pytest.raises(ValueError):
        sim.lsh_topk(emb, queries, planes, max_hamming=16)
    with pytest.raises(ValueError):
        sim.lsh_topk(emb, queries, planes, max_hamming=6, bands=4)
