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


def test_single_band_width64_mask(spark, sf_small, planes):
    """bands=1 slices the full 64-bit signature into one band; the mask
    (1<<64)-1 overflows LongType, so the all-ones mask must be -1.
    Regression for the width-64 overflow."""
    planes64 = planes + [list(-np.array(p)) for p in planes] + [
        [x * 2 for x in p] for p in planes
    ] + [[x * 3 for x in p] for p in planes]
    assert len(planes64) == 64
    emb, queries = _load(spark, sf_small)
    out = sim.lsh_topk(
        emb, queries.limit(2), planes64, k=3, max_hamming=0, bands=1
    ).collect()
    # max_hamming=0: every returned candidate has the identical signature
    assert all(r.rank >= 1 for r in out)


def test_minhash_band_signature_length_guard(spark, sf_small):
    """Banding with a num_hashes different from the signature length must
    fail loudly, not silently degenerate buckets. Regression for the
    silent num_hashes default."""
    from pyspark.sql.utils import PythonException

    from solar_data_tools_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(20)
    sigs = minhash_signatures(docs, num_hashes=32)
    with pytest.raises(Exception, match="signature length|num_hashes"):
        minhash_lsh_candidates(sigs, bands=16, num_hashes=64).collect()
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_candidates(sigs, bands=7, num_hashes=32)


def test_jaccard_sizes_use_filtered_shingles(spark):
    """With max_shingle_freq active, |A| and |B| must count the filtered
    shingle space, matching n_common. Regression for the denominator
    skew."""
    import pandas as pd

    from solar_data_tools_spark.operators.dedup import ngram_jaccard_pairs

    stop = "the quick brown"  # shared by every doc -> filtered out
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    f"{stop} alpha beta gamma delta",
                    f"{stop} alpha beta gamma epsilon",
                    f"{stop} zeta eta theta iota",
                ],
            }
        )
    )
    out = ngram_jaccard_pairs(
        docs, n=3, threshold=0.0, max_shingle_freq=2
    ).toPandas()
    pair = out[(out.id_a == 1) & (out.id_b == 2)]
    assert len(pair) == 1
    # after dropping the 3 stop-grams shared by all docs, docs 1 and 2
    # keep 2 shingles each ("quick brown alpha" chains die; the surviving
    # distinct 3-grams overlap in exactly 1) — denominator must be over
    # the filtered sets
    r = pair.iloc[0]
    assert r.jaccard == pytest.approx(
        r.n_common / (r.n_a + r.n_b - r.n_common)
    )
    # the invariant that breaks with the old bug: sizes equal the
    # filtered posting-list lengths, not the raw shingle counts
    from solar_data_tools_spark.operators.dedup import word_ngrams

    sh = word_ngrams(docs, 3).toPandas()
    raw_counts = sh.groupby("doc_id").size()
    freq = sh.groupby("shingle").doc_id.nunique()
    kept = sh[sh.shingle.map(freq) <= 2]
    kept_counts = kept.groupby("doc_id").size()
    assert r.n_a == kept_counts[1] and r.n_b == kept_counts[2]
    assert r.n_a < raw_counts[1]  # the filter actually removed something


def test_exact_duplicates_member_cap(spark):
    import pandas as pd

    from solar_data_tools_spark.operators.dedup import exact_duplicates

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(10), "text": ["same text here"] * 10}
        )
    )
    out = exact_duplicates(docs, member_cap=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r.group_size == 10  # exact count survives the cap
    assert r.member_ids == [0, 1, 2]  # members bounded by the cap


def test_embedding_cosine_dedup_lsh_vs_exact(spark, sf_small):
    """The LSH scale path of embedding-cosine dedup must return a SUBSET
    of the exact pairs with identical cosines, and full recall within
    its hamming bound (pigeonhole-lossless banding)."""
    import random

    import numpy as np

    from solar_data_tools_spark.operators.dedup import (
        embedding_cosine_duplicates,
    )
    from solar_data_tools_spark.session import read_table

    emb = read_table(spark, f"{sf_small}/embeddings.parquet")
    rng = random.Random(42)
    planes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(16)]
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_cosine_duplicates(emb, threshold=0.35).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_cosine_duplicates(
            emb, threshold=0.35, method="lsh", planes=planes, max_hamming=6
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert abs(v - exact[k]) < 1e-9
    # recall floor: recompute signatures in numpy; every exact pair
    # within the hamming bound MUST be found (banding is lossless there)
    pdf = emb.toPandas()
    mat = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    ids = pdf.vec_id.to_numpy()
    pl = np.array(planes)
    bits = (mat @ pl.T >= 0).astype(np.int64)
    sigs = (bits << np.arange(16)).sum(axis=1)
    sig_of = dict(zip(ids, sigs))
    for a, b in exact:
        if bin(int(sig_of[a]) ^ int(sig_of[b])).count("1") <= 6:
            assert (a, b) in lsh, (a, b)


def test_ivf_topk_exact_when_probing_all_cells(spark, sf_small):
    """n_probe == n_centroids degrades IVF to exact search: results must
    equal brute force row for row."""
    from solar_data_tools_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )
    from solar_data_tools_spark.session import read_table

    emb = read_table(spark, f"{sf_small}/embeddings.parquet")
    queries = emb.where("vec_id < 10").selectExpr(
        "vec_id as query_id", "embedding"
    )
    cent = train_ivf_centroids(emb, n_centroids=8)
    exact = {
        (r.query_id, r.rank): (r.vec_id, round(r.cosine_sim, 9))
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    ivf = {
        (r.query_id, r.rank): (r.vec_id, round(r.cosine_sim, 9))
        for r in ivf_topk(emb, queries, cent, k=5, n_probe=8).collect()
    }
    assert ivf == exact


def test_ivf_topk_recall_floor(spark, sf_small):
    """Probing a quarter of the cells must still recover most of the true
    top-5 on the synthetic embeddings (clustered labels => IVF-friendly)."""
    from solar_data_tools_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )
    from solar_data_tools_spark.session import read_table

    emb = read_table(spark, f"{sf_small}/embeddings.parquet")
    queries = emb.where("vec_id < 20").selectExpr(
        "vec_id as query_id", "embedding"
    )
    cent = train_ivf_centroids(emb, n_centroids=16)
    truth: dict = {}
    for r in brute_force_topk(emb, queries, k=5).collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    got: dict = {}
    for r in ivf_topk(emb, queries, cent, k=5, n_probe=4).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    recall = hits / total
    assert recall >= 0.5, recall


def test_simhash_md5_variant_guards_and_parity(spark, sf_small):
    """md5_60 token hash: >60 bits raises; fingerprints carry the same
    identical-text => identical-fingerprint property as the default."""
    import pytest as _pytest

    from solar_data_tools_spark.operators.dedup import simhash
    from solar_data_tools_spark.session import read_table

    docs = read_table(spark, f"{sf_small}/documents.parquet")
    with _pytest.raises(ValueError):
        simhash(docs, bits=64, token_hash="md5_60")
    with _pytest.raises(ValueError):
        simhash(docs, token_hash="sha9000")
    out = simhash(docs, bits=60, token_hash="md5_60").toPandas()
    txt = docs.select("doc_id", "text").toPandas()
    merged = txt.merge(out, on="doc_id")
    by_text = merged.groupby("text").simhash.nunique()
    assert (by_text == 1).all()  # same text -> same fingerprint
    assert (out.simhash >= 0).all()  # 60-bit fits signed long


def test_simhash_banded_join_is_lossless(spark, sf_small):
    """The banded Hamming join must return EXACTLY the all-pairs answer
    (pigeonhole over max_hamming+1 bands) — here with the default
    xxhash64 fingerprints, complementing q107's md5-variant oracle."""
    from solar_data_tools_spark.operators import dedup as dd
    from solar_data_tools_spark.session import read_table
    import pyspark.sql.functions as F

    docs = read_table(spark, f"{sf_small}/documents.parquet")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dd.simhash_near_duplicates(
            docs, max_hamming=5, bits=64
        ).collect()
    )
    fp = dd.simhash(docs)
    a = fp.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("fa"))
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("fb"))
    expected = sorted(
        (r["id_a"], r["id_b"], r["h"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
            .cast("long")
            .alias("h"),
        )
        .where(F.col("h") <= 5)
        .collect()
    )
    assert got == expected and len(got) > 0


def test_centroid_assign_matches_numpy(spark):
    """centroid_assign reproduces the numpy argmax assignment (with
    smaller-cluster tie-break) on random unit vectors."""
    import numpy as np

    from solar_data_tools_spark.operators.similarity import centroid_assign

    rng = np.random.default_rng(33)
    vecs = rng.normal(size=(40, 16))
    cents = rng.normal(size=(5, 16))
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        ["vec_id", "embedding"],
    )
    cdf = spark.createDataFrame(
        [(j, [float(x) for x in cents[j]]) for j in range(len(cents))],
        ["cluster", "cvec"],
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in centroid_assign(vdf, cdf).collect()
    }
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    sims = vn @ cn.T
    expected = {i: int(np.argmax(sims[i])) for i in range(len(vecs))}
    assert got == expected


def test_semdedup_planted_duplicates(spark):
    """Planted semantic near-dups: two tight groups around orthogonal
    directions plus one isolated vector. Within a group every vector but
    the lowest id is flagged; group representatives and the isolated
    vector are kept; max_prior_cos is NULL only for cluster-lowest ids."""
    from solar_data_tools_spark.operators.similarity import semdedup

    rng = np.random.default_rng(0)
    base_a = np.array([10.0, 0.0, 0.0, 0.0])
    base_b = np.array([0.0, 10.0, 0.0, 0.0])
    vecs = {
        0: base_a + rng.normal(0, 0.01, 4),
        1: base_a + rng.normal(0, 0.01, 4),
        2: base_a + rng.normal(0, 0.01, 4),
        3: base_b + rng.normal(0, 0.01, 4),
        4: base_b + rng.normal(0, 0.01, 4),
        5: np.array([0.0, 0.0, 10.0, 0.0]),  # isolated
    }
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        ["vec_id", "embedding"],
    )
    cdf = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]),
        ],
        ["cluster", "cvec"],
    )
    rows = {r["vec_id"]: r.asDict() for r in semdedup(vdf, cdf, tau=0.99).collect()}
    assert len(rows) == 6
    assert {i: rows[i]["is_dup"] for i in range(6)} == {
        0: False, 1: True, 2: True, 3: False, 4: True, 5: False,
    }
    for i in (0, 3, 5):  # cluster-lowest ids have no prior member
        assert rows[i]["max_prior_cos"] is None
    for i in (1, 2, 4):
        assert rows[i]["max_prior_cos"] > 0.99


def test_semdedup_cross_cell_blindness_is_by_design(spark):
    """Identical vectors assigned to DIFFERENT cells are NOT compared —
    the documented SemDeDup approximation (quadratic work only within a
    cell). Forcing distinct cells via tie-break keeps both copies."""
    from solar_data_tools_spark.operators.similarity import semdedup

    # both vectors equidistant from the two centroids -> tie-break puts
    # both in cluster 0; verify the contract instead with two clearly
    # separated centroids and copies placed NEAR DIFFERENT centroids:
    # cosine to own centroid dominates, so the (identical) vectors land
    # in different cells and are never compared.
    vdf = spark.createDataFrame(
        [(0, [1.0, 0.05, 0.0]), (1, [0.05, 1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    cdf = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])], ["cluster", "cvec"]
    )
    rows = {r["vec_id"]: r.asDict() for r in semdedup(vdf, cdf, tau=0.5).collect()}
    assert rows[0]["cluster"] != rows[1]["cluster"]
    assert not rows[0]["is_dup"] and not rows[1]["is_dup"]


def test_semdedup_mega_cell_error_and_subsplit(spark):
    """Mega-cell guard: a planted 8-row cell with max_cell_size=4 must
    (a) raise in 'error' mode naming the cell, (b) bound every join
    group to <= max_cell_size in 'subsplit' mode (pair count strictly
    below the unguarded within-cell quadratic), and (c) leave a normal
    cell's verdicts bit-identical to the unguarded path."""
    import pytest as _pytest

    from solar_data_tools_spark.operators.similarity import semdedup

    # cell 0: 8 identical vectors (mega); cell 1: 3 identical (normal)
    rows = [(i, [1.0, 0.0, 0.0]) for i in range(8)] + [
        (i, [0.0, 1.0, 0.0]) for i in range(100, 103)
    ]
    vdf = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cdf = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])], ["cluster", "cvec"]
    )
    with _pytest.raises(ValueError, match="mega-cell"):
        semdedup(vdf, cdf, tau=0.9, max_cell_size=4).collect()
    with _pytest.raises(ValueError, match="on_mega_cell"):
        semdedup(vdf, cdf, tau=0.9, max_cell_size=4, on_mega_cell="bogus")

    unguarded = {
        r["vec_id"]: r.asDict() for r in semdedup(vdf, cdf, tau=0.9).collect()
    }
    split = {
        r["vec_id"]: r.asDict()
        for r in semdedup(
            vdf, cdf, tau=0.9, max_cell_size=4, on_mega_cell="subsplit"
        ).collect()
    }
    # (c) normal cell (size 3 <= 4): identical verdicts
    for i in (100, 101, 102):
        assert split[i] == unguarded[i]
    # (b) mega-cell: every sub-cell keeps exactly one representative;
    # with 8 identical vectors in <=2 sub-cells, 1-2 survivors (vs 1
    # unguarded) and at least ceil(8/2)=4 dups per the pigeonhole bound
    survivors = [i for i in range(8) if not split[i]["is_dup"]]
    assert 1 <= len(survivors) <= 2
    assert sum(split[i]["is_dup"] for i in range(8)) >= 6
    assert 0 in survivors  # lowest id always survives


def test_train_ivf_centroids_sample_is_unbiased_and_invariant(spark):
    """The quantizer's bottom-k-by-seeded-hash sample must (a) span the
    id range rather than privileging the lowest ids, and (b) produce
    identical centroids under a different partitioning of the corpus."""
    import numpy as np_

    from solar_data_tools_spark.operators.sampling import hash_uniform
    from solar_data_tools_spark.operators.similarity import (
        train_ivf_centroids,
    )
    import pyspark.sql.functions as F

    n = 2000
    rng = np_.random.default_rng(7)
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(n)],
        ["vec_id", "embedding"],
    )
    cap = 200
    sampled_ids = [
        r["vec_id"]
        for r in vdf.orderBy(hash_uniform(F.col("vec_id"), 42), "vec_id")
        .limit(cap)
        .collect()
    ]
    # unbiased draw: both halves of the id range represented, and the
    # sample is NOT the lowest-id prefix (the old biased rule)
    assert sum(1 for i in sampled_ids if i >= n // 2) > cap // 4
    assert sorted(sampled_ids) != list(range(cap))

    c1 = train_ivf_centroids(vdf, n_centroids=8, sample_cap=cap)
    c2 = train_ivf_centroids(
        vdf.repartition(13, "vec_id"), n_centroids=8, sample_cap=cap
    )
    assert np_.allclose(c1, c2)


def test_train_ivf_centroids_distributed(spark):
    """Distributed Lloyd's: unit-norm centroids, deterministic under
    repartitioning, and recovers planted orthogonal cluster directions."""
    import numpy as np_

    from solar_data_tools_spark.operators.similarity import (
        train_ivf_centroids_distributed,
    )

    rng = np_.random.default_rng(3)
    dirs = np_.eye(4)
    rows = []
    for i in range(400):
        v = dirs[i % 4] * 5 + rng.normal(0, 0.05, 4)
        rows.append((i, [float(x) for x in v]))
    vdf = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cent = train_ivf_centroids_distributed(vdf, n_centroids=4, n_iters=5)
    assert cent.shape == (4, 4)
    assert np_.allclose(np_.linalg.norm(cent, axis=1), 1.0, atol=1e-9)
    # every planted direction is some centroid (cosine > 0.99)
    sims = cent @ dirs.T
    assert (sims.max(axis=0) > 0.99).all()
    cent2 = train_ivf_centroids_distributed(
        vdf.repartition(17, "vec_id"), n_centroids=4, n_iters=5
    )
    assert np_.allclose(cent, cent2)


def test_truncate_embeddings_semantics(spark):
    from pyspark.sql import Row
    import math

    from solar_data_tools_spark.operators import similarity as sim

    rows = [
        Row(vec_id=1, embedding=[3.0, 4.0, 0.0, 0.0]),
        Row(vec_id=2, embedding=[0.0, 0.0, 5.0, 12.0]),  # zero prefix
        Row(vec_id=3, embedding=[1.0]),                   # too short, dropped
    ]
    out = {
        r["vec_id"]: r
        for r in sim.truncate_embeddings(
            spark.createDataFrame(rows), dim=2
        ).collect()
    }
    assert set(out) == {1, 2}
    assert abs(out[1]["trunc_norm"] - 5.0) < 1e-12
    assert abs(out[1]["energy_ratio"] - 1.0) < 1e-12
    assert out[1]["renormed"] == [0.6, 0.8]
    # zero prefix: all-zero renorm, zero energy ratio, no NaN
    assert out[2]["trunc_norm"] == 0.0
    assert out[2]["energy_ratio"] == 0.0
    assert out[2]["renormed"] == [0.0, 0.0]
    assert not any(math.isnan(x) for x in out[2]["renormed"])


def test_semdedup_pair_engines_agree(spark):
    """The pandas (blocked-BLAS) pair engine must produce the same
    verdicts and max_prior_cos (to FP-sum tolerance, NULLs included) as
    the codegen expr engine on clustered data with sub-splitting."""
    import numpy as np_

    from solar_data_tools_spark.operators.similarity import semdedup

    rng = np_.random.default_rng(5)
    dirs = np_.eye(6)
    rows = [
        (i, [float(x) for x in dirs[i % 3] * 4 + rng.normal(0, 0.3, 6)])
        for i in range(120)
    ]
    vdf = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cdf = spark.createDataFrame(
        [(j, [float(x) for x in dirs[j]]) for j in range(3)],
        ["cluster", "cvec"],
    )
    kw = dict(tau=0.8, max_cell_size=15, on_mega_cell="subsplit")
    e = {
        r["vec_id"]: (r["is_dup"], r["cluster"], r["max_prior_cos"])
        for r in semdedup(vdf, cdf, **kw).collect()
    }
    p = {
        r["vec_id"]: (r["is_dup"], r["cluster"], r["max_prior_cos"])
        for r in semdedup(vdf, cdf, pair_engine="pandas", **kw).collect()
    }
    assert set(e) == set(p)
    for k in e:
        assert e[k][0] == p[k][0] and e[k][1] == p[k][1], (k, e[k], p[k])
        if e[k][2] is None:
            assert p[k][2] is None, k
        else:
            assert abs(e[k][2] - p[k][2]) < 1e-9, (k, e[k], p[k])
    with __import__("pytest").raises(ValueError, match="pair_engine"):
        semdedup(vdf, cdf, pair_engine="bogus")


def test_binarize_packing_matches_numpy(spark, sf_small):
    import numpy as np

    from solar_data_tools_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet").limit(64)
    got = sim.binarize_embeddings(emb).orderBy("vec_id").toPandas()
    src = emb.orderBy("vec_id").toPandas()
    for (_, g), (_, s) in zip(got.iterrows(), src.iterrows()):
        v = np.asarray(s["embedding"], dtype=np.float64)
        b0 = sum(1 << i for i in range(32) if v[i] > 0)
        b1 = sum(1 << i for i in range(32) if v[32 + i] > 0)
        assert (g["b0"], g["b1"]) == (b0, b1)


def test_hamming_topk_exact_and_angular_correlation(spark, sf_small):
    """Hamming distances must equal the popcount of the sign-pattern
    xor, and (sanity) correlate positively with angular distance."""
    import numpy as np

    from solar_data_tools_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    bits = sim.binarize_embeddings(emb)
    q = bits.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "b0", "b1"
    )
    got = sim.hamming_topk(bits, q, k=50).toPandas()
    assert (got["vec_id"] != got["query_id"]).all()
    pdf = emb.orderBy("vec_id").toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    signs = mat > 0
    for qid in (0, 1):
        qs = signs[ids == qid][0]
        ham = (signs != qs[None, :]).sum(axis=1)
        sub = got[got["query_id"] == qid].sort_values("rank")
        expect_ids = [
            i for i in ids[np.lexsort((ids, ham))] if i != qid
        ][:50]
        assert list(sub["vec_id"]) == expect_ids
        assert list(sub["hamming"]) == sorted(
            ham[np.isin(ids, expect_ids)]
        )
        # sanity: among returned top-50, mean cosine to query beats
        # the corpus mean (binary quantization preserves angular order)
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        qv = unit[ids == qid][0]
        cos_all = unit @ qv
        top = np.isin(ids, sub["vec_id"].to_numpy())
        assert cos_all[top].mean() > cos_all[~top].mean()


def test_hyperplane_signature_engines_agree(spark, sf_small):
    """The numpy scale engine and the expression engine must produce
    identical signatures (a flip would need a dot within reassociation
    error of zero)."""
    import random

    from solar_data_tools_spark.operators import similarity as sim

    rng = random.Random(11)
    planes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(24)]
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    a = {
        r["vec_id"]: r["lsh_sig"]
        for r in sim.random_hyperplane_signatures(
            emb, planes, engine="pandas"
        ).collect()
    }
    b = {
        r["vec_id"]: r["lsh_sig"]
        for r in sim.random_hyperplane_signatures(
            emb, planes, engine="expr"
        ).collect()
    }
    assert a == b and len(a) == 500


def test_centroid_assign_engines_agree(spark, sf_small):
    from solar_data_tools_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    seeds = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cluster"), F.col("embedding").alias("cvec")
    )
    a = {
        r["vec_id"]: (r["cluster"], round(r["cosine"], 9))
        for r in sim.centroid_assign(emb, seeds, engine="pandas").collect()
    }
    b = {
        r["vec_id"]: (r["cluster"], round(r["cosine"], 9))
        for r in sim.centroid_assign(emb, seeds, engine="expr").collect()
    }
    assert len(a) == 500
    assert all(a[k][0] == b[k][0] for k in a)  # identical clusters
    assert all(abs(a[k][1] - b[k][1]) < 1e-9 for k in a)


def test_quantize_engines_bit_identical(spark, sf_small):
    from solar_data_tools_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    a = sim.quantize_embeddings(emb, engine="pandas").orderBy("vec_id").toPandas()
    b = sim.quantize_embeddings(emb, engine="expr").orderBy("vec_id").toPandas()
    assert [list(x) for x in a["quantized"]] == [list(x) for x in b["quantized"]]
    for c in ("vmin", "vmax", "mean_abs_err", "max_abs_err"):
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c  # bit-equal


def test_truncate_engines_bit_identical(spark, sf_small):
    from solar_data_tools_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    a = sim.truncate_embeddings(emb, 16, engine="pandas").orderBy("vec_id").toPandas()
    b = sim.truncate_embeddings(emb, 16, engine="expr").orderBy("vec_id").toPandas()
    assert (a["trunc_norm"].to_numpy() == b["trunc_norm"].to_numpy()).all()
    assert (a["energy_ratio"].to_numpy() == b["energy_ratio"].to_numpy()).all()
    import numpy as np

    assert all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(a["renormed"], b["renormed"])
    )


def test_binary_rerank_recall_vs_brute_force(spark, sf_small):
    """Two-stage retrieval: candidates ⊆ hamming-prefilter set; recall@5
    against exact brute force beats random (sanity) and grows with the
    prefilter width (monotone candidate-set nesting)."""
    from solar_data_tools_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.brute_force_topk(emb, queries, k=5)
    truth = {
        (r["query_id"], r["vec_id"]) for r in exact.collect()
    }

    def recall(prefilter):
        got = sim.binary_rerank_topk(
            emb, queries, k=5, prefilter=prefilter
        ).collect()
        hits = {(r["query_id"], r["vec_id"]) for r in got} & truth
        return len(hits) / len(truth)

    r40, r200 = recall(40), recall(200)
    assert r200 >= r40
    assert r200 >= 0.4  # 200 of 500 candidates must recover >= 40%
    # full prefilter == brute force exactly
    full = sim.binary_rerank_topk(emb, queries, k=5, prefilter=500)
    got = {(r["query_id"], r["vec_id"]) for r in full.collect()}
    assert got == truth


def test_minhash_signature_engines_identical(spark, sf_small):
    """The numpy xxHash64 kernel must reproduce the JVM agg shape's
    signatures bit-for-bit (it replicates Spark's long+int hash paths
    exactly)."""
    from solar_data_tools_spark.operators import dedup as dd
    from solar_data_tools_spark.session import read_table

    docs = read_table(spark, f"{sf_small}/documents.parquet")
    a = {
        r["doc_id"]: list(r["signature"])
        for r in dd.minhash_signatures(
            docs, 32, 3, sig_engine="pandas"
        ).collect()
    }
    b = {
        r["doc_id"]: list(r["signature"])
        for r in dd.minhash_signatures(
            docs, 32, 3, sig_engine="agg"
        ).collect()
    }
    assert a == b and len(a) == 500


def test_md5_u31_signatures_match_pure_python(spark, sf_small):
    """The round-9 md5_u31 family (q47's certified default) must equal a
    pure-Python replay — one md5 per distinct shingle, two 28-bit hex
    slices, h_i = (a_i*x0 + b_i*x1 + c_i) mod 2^31-1, min per
    permutation — proving the family is engine-portable integer
    arithmetic (the DuckDB oracle spells the identical ops)."""
    import hashlib
    import re as _re

    from solar_data_tools_spark.operators import dedup as dd
    from solar_data_tools_spark.session import read_table

    k = 8
    consts = dd.md5_u31_constants(k)
    p31 = (1 << 31) - 1
    docs = read_table(spark, f"{sf_small}/documents.parquet").limit(50)
    got = {
        r["doc_id"]: list(r["signature"])
        for r in dd.minhash_signatures(
            docs, k, 1, token_hash="md5_u31"
        ).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        toks = _re.sub(r"\s+", " ", row["text"].lower()).strip().split(" ")
        shingles = list(dict.fromkeys(toks))
        if not shingles:
            continue
        sig = []
        for a, b, c in consts:
            best = None
            for s in shingles:
                h = hashlib.md5(s.encode()).hexdigest()
                x0, x1 = int(h[0:7], 16), int(h[8:15], 16)
                v = (a * x0 + b * x1 + c) % p31
                best = v if best is None or v < best else best
            sig.append(best)
        assert got[row["doc_id"]] == sig, row["doc_id"]


def test_brute_force_engines_bit_identical(spark, sf_small):
    """All three brute-force engines fold the dot product sequentially
    over dimension j, so cosines (and hence ranks) must be BIT-equal —
    the invariant that lets the map engine replace the join engine
    without touching the q46 oracle."""
    from solar_data_tools_spark.operators.similarity import brute_force_topk
    from solar_data_tools_spark.session import read_table

    emb = read_table(spark, f"{sf_small}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    outs = {
        eng: brute_force_topk(emb, queries, k=5, engine=eng)
        .orderBy("query_id", "rank")
        .collect()
        for eng in ("map", "join-pandas", "join-hof")
    }
    base = outs["map"]
    assert len(base) == 25
    for eng in ("join-pandas", "join-hof"):
        for x, y in zip(base, outs[eng]):
            assert x["vec_id"] == y["vec_id"], (eng, x, y)
            assert x["cosine_sim"] == y["cosine_sim"], (eng, x, y)


def test_brute_force_map_engine_query_cap(spark, sf_small):
    from solar_data_tools_spark.operators.similarity import brute_force_topk
    from solar_data_tools_spark.session import read_table

    emb = read_table(spark, f"{sf_small}/embeddings.parquet")
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="query_cap"):
        brute_force_topk(emb, queries, k=5, engine="map", query_cap=3)


def test_brute_force_default_dispatch_cap_fallback_covers_all_queries(
    spark, sf_small
):
    """Round-9 regression (r8 ADVICE, high): when the query set exceeds
    query_cap under DEFAULT dispatch, the fallback must actually run the
    join engine over the FULL query set — the r8 code reassigned
    ``engine`` but still executed the map body on the truncated
    limit(cap+1) collection, silently dropping queries beyond the cap."""
    from solar_data_tools_spark.operators.similarity import brute_force_topk
    from solar_data_tools_spark.session import read_table

    emb = read_table(spark, f"{sf_small}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(emb, queries, k=3, query_cap=4)  # default dispatch
    got_qids = {r["query_id"] for r in out.select("query_id").distinct().collect()}
    assert got_qids == set(range(10)), got_qids
    # and the fallback result is bit-equal to the explicit join engine
    ref = brute_force_topk(emb, queries, k=3, engine="join-pandas")
    a = out.orderBy("query_id", "rank").collect()
    b = ref.orderBy("query_id", "rank").collect()
    assert [(x["query_id"], x["vec_id"], x["cosine_sim"]) for x in a] == [
        (y["query_id"], y["vec_id"], y["cosine_sim"]) for y in b
    ]


def test_semantic_decontaminate_planted(spark):
    """A train vector parallel to an eval vector is contaminated at any
    tau < 1; an orthogonal one is not; nearest_eval_id ties break toward
    the smallest eval id."""
    from solar_data_tools_spark.operators.similarity import (
        semantic_decontaminate,
    )

    ev = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (200, [1.0, 0.0, 0.0]),
         (300, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    tr = spark.createDataFrame(
        [(1, [2.0, 0.0, 0.0]),   # parallel to eval 100/200 -> cos 1, tie
         (2, [0.0, 0.0, 5.0])],  # orthogonal to every eval vector
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in
           semantic_decontaminate(tr, ev, tau=0.9).collect()}
    assert out[1]["is_contaminated"] and out[1]["max_eval_cos"] == 1.0
    assert out[1]["nearest_eval_id"] == 100  # tie -> smallest eval id
    assert not out[2]["is_contaminated"]
    assert abs(out[2]["max_eval_cos"]) < 1e-12


def test_semantic_decontaminate_empty_eval_raises(spark):
    from solar_data_tools_spark.operators.similarity import (
        semantic_decontaminate,
    )

    tr = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="eval set is empty"):
        semantic_decontaminate(tr, tr.where(F.col("vec_id") < 0))


def test_semantic_decontaminate_streaming_matches_batch(spark, tmp_path):
    """semantic_decontaminate is stream-legal once the eval matrix is
    fixed (a stateless mapInPandas over the train stream): an
    availableNow file stream produces exactly the batch verdicts — the
    ingest-time shape for decontaminating a live crawl against a frozen
    benchmark set."""
    import numpy as np

    from solar_data_tools_spark.operators.similarity import (
        semantic_decontaminate,
    )

    rng = np.random.default_rng(5)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=8)]) for i in range(60)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    ev = emb.where(F.col("vec_id") < 5)
    tr = emb.where(F.col("vec_id") >= 5)
    src = str(tmp_path / "decontam_src")
    tr.write.parquet(src)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(src)
    q = (
        semantic_decontaminate(stream, ev, tau=0.35)
        .writeStream.format("memory")
        .queryName("decontam_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["vec_id"]: (r["nearest_eval_id"], r["max_eval_cos"],
                      r["is_contaminated"])
        for r in spark.sql("select * from decontam_stream_test").collect()
    }
    batch = {
        r["vec_id"]: (r["nearest_eval_id"], r["max_eval_cos"],
                      r["is_contaminated"])
        for r in semantic_decontaminate(tr, ev, tau=0.35).collect()
    }
    assert streamed == batch and len(batch) == 55


# ---------------------------------------------------------------------------
# minhash_incremental_dedup — the per-dump signature-store loop (round 12)
# ---------------------------------------------------------------------------


def _mk_docs(spark, rows):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


_XT = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
_YT = "kilo lima mike november oscar papa quebec romeo sierra tango"
_ZT = "uniform victor whiskey xray yankee zulu one two three four"
_WT = "red orange yellow green blue indigo violet cyan magenta black"
_VT = "north south east west up down left right front back"


def test_minhash_incremental_verdicts(spark):
    """Deterministic verdict semantics on exact-copy relationships
    (64/64 components match -> no estimator noise): history precedence
    over snapshot, min-id canonicalization, keep = new."""
    from solar_data_tools_spark.operators.dedup import (
        minhash_incremental_dedup,
        minhash_signatures,
    )

    hist = _mk_docs(spark, [(1, _XT), (2, _YT)])
    store = minhash_signatures(hist, 64, 1, token_hash="md5_u31")
    new = _mk_docs(
        spark,
        [
            (10, _XT),  # copy of history doc 1
            (11, _XT),  # ALSO a history copy -> history_dup, not
            #             snapshot_dup (precedence), matched_id=1
            (12, _ZT),  # unique -> new
            (13, _WT),  # first of a within-dump pair -> new
            (14, _WT),  # within-dump copy -> snapshot_dup matched 13
            (15, _VT),  # unique -> new
        ],
    )
    out = {
        r["doc_id"]: (r["verdict"], r["matched_id"], r["keep"])
        for r in minhash_incremental_dedup(
            new, store, num_hashes=64, bands=8, n=1, sim_threshold=0.7,
            token_hash="md5_u31",
        ).collect()
    }
    assert out == {
        10: ("history_dup", 1, False),
        11: ("history_dup", 1, False),
        12: ("new", None, True),
        13: ("new", None, True),
        14: ("snapshot_dup", 13, False),
        15: ("new", None, True),
    }


def test_minhash_incremental_store_id_collides_with_dump_id(spark):
    """A store id EQUAL to a dump id must not cross-match (round-13
    regression guard: the fused verdict pipeline unions store and dump
    signatures into one reference table and keys the verify join on
    (id, provenance) — an id-only key would wrongly join doc 5's dump
    signature against doc 5's UNRELATED store signature). Store doc 5
    and dump doc 5 share nothing textually; dump doc 5 matches store
    doc 7 instead, and history precedence still beats the within-dump
    copy at id 6."""
    from solar_data_tools_spark.operators.dedup import (
        minhash_incremental_dedup,
        minhash_signatures,
    )

    hist = _mk_docs(spark, [(5, _YT), (7, _XT)])
    store = minhash_signatures(hist, 64, 1, token_hash="md5_u31")
    new = _mk_docs(
        spark,
        [
            (5, _XT),   # same id as a store row, DIFFERENT text ->
            #             must match store doc 7 (the _XT row), never
            #             alias against store doc 5's signature
            (6, _XT),   # also a history copy -> history_dup(7), not
            #             snapshot_dup(5)
            (8, _ZT),   # unique -> new
        ],
    )
    out = {
        r["doc_id"]: (r["verdict"], r["matched_id"], r["keep"])
        for r in minhash_incremental_dedup(
            new, store, num_hashes=64, bands=8, n=1, sim_threshold=0.7,
            token_hash="md5_u31",
        ).collect()
    }
    assert out == {
        5: ("history_dup", 7, False),
        6: ("history_dup", 7, False),
        8: ("new", None, True),
    }


def test_minhash_incremental_store_append_is_fresh_signing(spark):
    """The keep rows' carried signatures ARE the store delta: appending
    them must equal signing those docs from scratch (no re-sign needed,
    byte-for-byte)."""
    from solar_data_tools_spark.operators.dedup import (
        minhash_incremental_dedup,
        minhash_signatures,
    )

    hist = _mk_docs(spark, [(1, _XT)])
    store = minhash_signatures(hist, 64, 1, token_hash="md5_u31")
    new = _mk_docs(spark, [(10, _XT), (12, _ZT), (13, _WT)])
    out = minhash_incremental_dedup(
        new, store, num_hashes=64, bands=8, n=1, token_hash="md5_u31"
    )
    delta = {
        r["doc_id"]: list(r["signature"])
        for r in out.where("keep").select("doc_id", "signature").collect()
    }
    fresh = {
        r["doc_id"]: list(r["signature"])
        for r in minhash_signatures(
            new.where(F.col("doc_id").isin(12, 13)), 64, 1,
            token_hash="md5_u31",
        ).collect()
    }
    assert delta == fresh and set(delta) == {12, 13}


def test_minhash_incremental_store_geometry_guard(spark):
    """A store signed with a different num_hashes must fail loudly —
    silently short-sliced bands would mark the whole dump history_dup."""
    from solar_data_tools_spark.operators.dedup import (
        minhash_incremental_dedup,
        minhash_signatures,
    )

    hist = _mk_docs(spark, [(1, _XT)])
    store32 = minhash_signatures(hist, 32, 1, token_hash="md5_u31")
    new = _mk_docs(spark, [(10, _ZT)])
    with pytest.raises(Exception, match="signature length|num_hashes"):
        minhash_incremental_dedup(
            new, store32, num_hashes=64, bands=8, token_hash="md5_u31"
        ).collect()
    with pytest.raises(ValueError, match="divisible"):
        minhash_incremental_dedup(new, store32, num_hashes=64, bands=7)


def test_streaming_signature_store_dedup_matches_batch(spark, tmp_path):
    """The streaming face's HISTORY dimension must agree with the batch
    operator: streaming history_dup set == batch history_dup set with
    equal matched ids; batch snapshot_dups (within-dump, deliberately
    out of streaming scope) surface as streaming 'new'."""
    import pandas as pd

    from solar_data_tools_spark.operators.dedup import (
        minhash_incremental_dedup,
        minhash_signatures,
    )
    from solar_data_tools_spark.streaming.dedup_stream import (
        streaming_signature_store_dedup,
    )

    hist = _mk_docs(spark, [(1, _XT), (2, _YT)])
    store = minhash_signatures(hist, 64, 1, token_hash="md5_u31")
    new_rows = [
        (10, _XT),   # history_dup matched 1
        (11, _YT),   # history_dup matched 2
        (12, _ZT),   # new
        (13, _WT),   # new (first of within-dump pair)
        (14, _WT),   # batch: snapshot_dup; streaming: new (documented)
    ]
    new = _mk_docs(spark, new_rows)

    batch = {
        r["doc_id"]: (r["verdict"], r["matched_id"])
        for r in minhash_incremental_dedup(
            new, store, num_hashes=64, bands=8, n=1, token_hash="md5_u31"
        ).collect()
    }

    src = str(tmp_path / "sigstore_stream_src")
    ts = pd.Timestamp("2024-06-01 12:00:00")
    spark.createDataFrame(
        pd.DataFrame(
            [(i, t, ts) for i, t in new_rows],
            columns=["doc_id", "text", "ingest_ts"],
        )
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, ingest_ts timestamp"
    ).parquet(src)
    q = (
        streaming_signature_store_dedup(stream, store)
        .writeStream.format("memory")
        .queryName("sigstore_stream_test")
        # complete mode: with one microbatch the watermark never passes
        # the (single) in-flight window, so append would emit nothing
        # until more data arrives — production uses append + watermark
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r["doc_id"]: (r["verdict"], r["matched_id"])
        for r in spark.sql("select * from sigstore_stream_test").collect()
    }
    assert set(streamed) == set(batch)
    for doc, (bv, bm) in batch.items():
        sv, sm = streamed[doc]
        if bv == "history_dup":
            assert (sv, sm) == ("history_dup", bm), doc
        else:  # batch 'snapshot_dup' and 'new' both stream as 'new'
            assert (sv, sm) == ("new", None), doc
    assert batch[14][0] == "snapshot_dup"  # the documented boundary


_UT = "gold silver bronze copper iron tin lead zinc nickel cobalt"
_QT = "apple pear plum peach cherry grape mango lemon lime fig"


def test_minhash_incremental_multi_dump_loop(spark):
    """The operator's real usage pattern — the per-dump loop: start
    from an EMPTY store, process three dumps sequentially, append each
    dump's keeps (their carried signatures, no re-signing). Planted
    expectations per dump, plus the structural invariant the loop
    guarantees: every store row was checked against all rows present at
    its admission and rows are only ever added, so the FINAL store is
    pairwise non-similar under the operator's own criterion."""
    from solar_data_tools_spark.operators.dedup import (
        minhash_incremental_dedup,
        minhash_signatures,
    )

    kw = dict(num_hashes=64, bands=8, n=1, sim_threshold=0.7,
              token_hash="md5_u31")
    store = minhash_signatures(
        spark.createDataFrame([], "doc_id long, text string"), 64, 1,
        token_hash="md5_u31",
    )
    dumps = [
        [(1, _XT), (2, _YT), (3, _XT)],           # 3 dups 1 in-dump
        [(11, _XT), (12, _ZT), (13, _ZT)],        # 11 dups history 1
        [(21, _YT), (22, _WT), (23, _UT), (24, _QT)],
    ]
    expected = {
        1: ("new", None), 2: ("new", None), 3: ("snapshot_dup", 1),
        11: ("history_dup", 1), 12: ("new", None),
        13: ("snapshot_dup", 12),
        21: ("history_dup", 2), 22: ("new", None), 23: ("new", None),
        24: ("new", None),
    }
    got = {}
    for rows in dumps:
        out = minhash_incremental_dedup(_mk_docs(spark, rows), store, **kw)
        got.update(
            (r["doc_id"], (r["verdict"], r["matched_id"]))
            for r in out.collect()
        )
        # the append IS the keeps' carried signatures — no re-sign
        store = store.unionByName(
            out.where("keep").select("doc_id", "signature")
        ).localCheckpoint(eager=True)
    assert got == expected

    # structural invariant: the final store is pairwise non-similar
    # (band collision + >= 45/64 matching components finds no pair)
    sigs = store.alias("a").crossJoin(store.alias("b")).where(
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    n_eq = None
    for i in range(64):
        t = F.when(
            F.element_at("a.signature", i + 1)
            == F.element_at("b.signature", i + 1),
            1,
        ).otherwise(0)
        n_eq = t if n_eq is None else n_eq + t
    assert sigs.where(n_eq >= 45).count() == 0
    assert store.count() == 6  # keeps: 1, 2, 12, 22, 23, 24


def test_minhash_signature_expr_bit_identical_to_batch(spark, sf_small):
    """The row-local (stream-legal) signature expression must be
    BIT-identical to the batch min-aggregate formulation — same md5_u31
    family, same shingling, NULL exactly where the batch path drops the
    doc (fewer than n tokens)."""
    from solar_data_tools_spark.operators.dedup import (
        minhash_signature_expr,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(60)
    for num_hashes, n in ((64, 1), (16, 3)):
        batch = {
            r["doc_id"]: list(r["signature"])
            for r in minhash_signatures(
                docs, num_hashes, n, token_hash="md5_u31"
            ).collect()
        }
        rowlocal = {
            r["doc_id"]: (None if r["sig"] is None else list(r["sig"]))
            for r in docs.select(
                "doc_id",
                minhash_signature_expr("text", num_hashes, n).alias("sig"),
            ).collect()
        }
        for doc, sig in batch.items():
            assert rowlocal[doc] == sig, (num_hashes, n, doc)
        for doc, sig in rowlocal.items():
            assert (sig is None) == (doc not in batch), (num_hashes, n, doc)


def test_minhash_incremental_banded_store_parity(spark, sf_small):
    """The pre-banded persisted store layout (minhash_band_store +
    store_is_banded=True) must produce IDENTICAL verdicts to the raw
    signature-store path, and its geometry guard must still fire."""
    from solar_data_tools_spark.operators.dedup import (
        minhash_band_store,
        minhash_incremental_dedup,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    hist = docs.where(F.col("doc_id") < 250)
    new = docs.where(F.col("doc_id") >= 250)
    kw = dict(num_hashes=64, bands=8, n=1, sim_threshold=0.7,
              block_cols=["lang", "source"], token_hash="md5_u31")
    store = minhash_signatures(
        hist, 64, 1, carry_cols=["lang", "source"], token_hash="md5_u31"
    ).localCheckpoint(eager=True)

    def snap(out):
        return sorted(
            (r["doc_id"], r["verdict"], r["matched_id"], r["keep"])
            for r in out.select(
                "doc_id", "verdict", "matched_id", "keep"
            ).collect()
        )

    raw = snap(minhash_incremental_dedup(new, store, **kw))
    banded = minhash_band_store(
        store, bands=8, num_hashes=64, block_cols=["lang", "source"]
    )
    via_banded = snap(
        minhash_incremental_dedup(
            new, banded, store_is_banded=True, **kw
        )
    )
    assert via_banded == raw
    assert any(v == "history_dup" for _, v, _, _ in raw)  # non-trivial

    # geometry guard on the banded layout
    store32 = minhash_signatures(
        hist.limit(5), 32, 1, carry_cols=["lang", "source"],
        token_hash="md5_u31",
    )
    banded32 = minhash_band_store(
        store32, bands=8, num_hashes=32, block_cols=["lang", "source"]
    )
    with pytest.raises(Exception, match="signature length|num_hashes"):
        minhash_incremental_dedup(
            new.limit(5), banded32, store_is_banded=True, **kw
        ).collect()


def test_embedding_incremental_dedup_exact_and_lsh(spark, sf_small):
    """The embedding-family incremental operator: exact-path verdict
    semantics against an independently computed reference, and the LSH
    scale path's conservative contract — verification means it never
    INVENTS a dup (keep_exact subset of keep_lsh), and within the
    hamming bound its store matches are real pairs above threshold."""
    import random

    import numpy as np

    from solar_data_tools_spark.operators.dedup import (
        embedding_incremental_dedup,
    )
    from solar_data_tools_spark.session import read_table

    emb = read_table(spark, f"{sf_small}/embeddings.parquet")
    mid = (emb.agg(F.max("vec_id")).collect()[0][0] + 1) // 2
    store = emb.where(F.col("vec_id") < mid)
    new = emb.where(F.col("vec_id") >= mid)

    exact = {
        r["vec_id"]: (r["verdict"], r["matched_id"], r["keep"])
        for r in embedding_incremental_dedup(
            new, store, threshold=0.35, method="exact"
        ).collect()
    }
    assert len(exact) == new.count()

    # independent numpy reference for the exact path
    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    ids = pdf.vec_id.to_numpy()
    nrm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = nrm @ nrm.T
    for i, vid in enumerate(ids):
        if vid < mid:
            continue
        s_match = [j for j in ids[ids < mid] if cos[i, j] >= 0.35]
        b_match = [
            j for j in ids[(ids >= mid) & (ids < vid)]
            if cos[i, j] >= 0.35
        ]
        if s_match:
            want = ("store_dup", min(s_match), False)
        elif b_match:
            want = ("batch_dup", min(b_match), False)
        else:
            want = ("new", None, True)
        assert exact[vid] == want, (vid, exact[vid], want)

    rng = random.Random(42)
    planes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(16)]
    lsh = {
        r["vec_id"]: (r["verdict"], r["matched_id"], r["keep"])
        for r in embedding_incremental_dedup(
            new, store, threshold=0.35, method="lsh", planes=planes,
            max_hamming=6,
        ).collect()
    }
    assert set(lsh) == set(exact)
    # conservative: LSH never invents a dup
    for vid, (v, m, k) in lsh.items():
        if not k:
            assert not exact[vid][2], vid  # exact also saw a dup
            # and the match it reports is a REAL pair above threshold
            assert cos[vid, m] >= 0.35
    # a persisted lsh_sig column on the store is honored
    from solar_data_tools_spark.operators.similarity import (
        random_hyperplane_signatures,
    )

    store_sig = store.join(
        random_hyperplane_signatures(store, planes).select(
            "vec_id", "lsh_sig"
        ),
        "vec_id",
    )
    lsh2 = {
        r["vec_id"]: (r["verdict"], r["matched_id"], r["keep"])
        for r in embedding_incremental_dedup(
            new, store_sig, threshold=0.35, method="lsh", planes=planes,
            max_hamming=6,
        ).collect()
    }
    assert lsh2 == lsh

def test_banded_store_geometry_recorded_and_validated(spark):
    """r13 (ADVICE): signature LENGTH alone cannot distinguish a store
    banded at bands=16 from bands=8 for the same num_hashes — the band
    hashes differ silently and NO bucket ever collides, so every
    history dup would be verdicted 'new'. The layout now records its
    slice width (band_r) and the consumer validates it on a join key,
    so the wrong-bands store RAISES even with zero collisions; a store
    lacking the geometry column (pre-r13 layout) is rejected eagerly."""
    from solar_data_tools_spark.operators.dedup import (
        minhash_band_store,
        minhash_incremental_dedup,
        minhash_signatures,
    )

    hist = _mk_docs(spark, [(1, _XT), (2, _YT)])
    store = minhash_signatures(hist, 64, 1, token_hash="md5_u31")
    new = _mk_docs(spark, [(10, _XT), (11, _ZT)])
    kw = dict(num_hashes=64, bands=8, n=1, token_hash="md5_u31")

    # sanity: right geometry passes and finds the history dup
    ok = minhash_band_store(store, bands=8, num_hashes=64)
    assert "band_r" in ok.columns
    got = {
        r["doc_id"]: r["verdict"]
        for r in minhash_incremental_dedup(
            new, ok, store_is_banded=True, **kw
        ).collect()
    }
    assert got == {10: "history_dup", 11: "new"}

    # same num_hashes, different bands: length guard is blind, band_r
    # guard must fire (this was the silent-degeneration hole)
    wrong_bands = minhash_band_store(store, bands=16, num_hashes=64)
    with pytest.raises(Exception, match="band_r|geometry"):
        minhash_incremental_dedup(
            new, wrong_bands, store_is_banded=True, **kw
        ).collect()

    # pre-r13 layout (no band_r column): eager, named rejection
    legacy = ok.drop("band_r")
    with pytest.raises(ValueError, match="band_r"):
        minhash_incremental_dedup(new, legacy, store_is_banded=True, **kw)


def test_streaming_signature_store_geometry_guard(spark, tmp_path):
    """r13 (ADVICE): the streaming face must refuse a store signed with
    a different num_hashes instead of silently streaming every doc as
    'new' (short slices -> mismatched band hashes -> no collision)."""
    import pandas as pd

    from solar_data_tools_spark.operators.dedup import minhash_signatures
    from solar_data_tools_spark.streaming.dedup_stream import (
        streaming_signature_store_dedup,
    )

    store32 = minhash_signatures(
        _mk_docs(spark, [(1, _XT)]), 32, 1, token_hash="md5_u31"
    )
    src = str(tmp_path / "sigstore_guard_src")
    ts = pd.Timestamp("2024-06-01 12:00:00")
    spark.createDataFrame(
        pd.DataFrame(
            [(10, _XT, ts)], columns=["doc_id", "text", "ingest_ts"]
        )
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, ingest_ts timestamp"
    ).parquet(src)
    q = (
        streaming_signature_store_dedup(stream, store32, num_hashes=64)
        .writeStream.format("memory")
        .queryName("sigstore_guard_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="signature length|num_hashes"):
        q.awaitTermination(180)
        if q.exception() is not None:
            raise q.exception()


def test_embedding_incremental_drops_degenerate_vectors(spark):
    """r13 (ADVICE): NULL and all-zero embeddings have no cosine
    direction — they are DROPPED from the verdict output (not silently
    kept as 'new'), and degenerate STORE rows match nothing."""
    from solar_data_tools_spark.operators.dedup import (
        embedding_incremental_dedup,
    )

    store = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    new = spark.createDataFrame(
        [
            (10, [2.0, 0.0]),   # store_dup of 1
            (11, [0.0, 0.0]),   # degenerate: dropped
            (12, None),         # degenerate: dropped
            (13, [0.0, 0.0]),   # exact copy of 11 — still dropped
            (14, [0.0, 1.0]),   # new
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["verdict"], r["matched_id"], r["keep"])
        for r in embedding_incremental_dedup(
            new, store, threshold=0.9, method="exact"
        ).collect()
    }
    assert got == {10: ("store_dup", 1, False), 14: ("new", None, True)}

    # LSH path: same drop contract (degenerates never reach signing)
    planes = [[1.0, 0.5], [-0.3, 1.0], [0.7, -0.2]]
    got_lsh = {
        r["vec_id"]: r["verdict"]
        for r in embedding_incremental_dedup(
            new, store, threshold=0.9, method="lsh", planes=planes,
            max_hamming=2,
        ).collect()
    }
    assert set(got_lsh) == {10, 14}


def test_minhash_signature_expr_quoted_column(spark):
    """r13 (ADVICE): a non-bare column name (spaces) must resolve as
    one identifier in the generated SQL fragments — signature values
    identical to the same text under a bare name."""
    from solar_data_tools_spark.operators.dedup import (
        minhash_signature_expr,
    )

    plain = spark.createDataFrame(
        [(1, _XT)], "doc_id long, text string"
    ).select(
        "doc_id", minhash_signature_expr("text", 16, 1).alias("sig")
    )
    weird = spark.createDataFrame(
        [(1, _XT)], "doc_id long, `my text col` string"
    ).select(
        "doc_id",
        minhash_signature_expr("my text col", 16, 1).alias("sig"),
    )
    assert weird.collect()[0]["sig"] == plain.collect()[0]["sig"]

def test_seeded_hyperplanes_and_carry_cols(spark):
    """r13: the seeded plane constructor is deterministic (same seed ->
    identical family; different seed -> different) with the right
    geometry, and random_hyperplane_signatures carries extra columns
    through BOTH engines without changing the signature bits."""
    from solar_data_tools_spark.operators.similarity import (
        random_hyperplane_signatures,
        seeded_hyperplanes,
    )

    p1 = seeded_hyperplanes(16, 8, seed=7)
    assert p1 == seeded_hyperplanes(16, 8, seed=7)
    assert p1 != seeded_hyperplanes(16, 8, seed=8)
    assert len(p1) == 16 and all(len(p) == 8 for p in p1)

    emb = spark.createDataFrame(
        [(1, [float(i) - 3.5 for i in range(8)], "a"),
         (2, [1.0] * 8, "b")],
        "vec_id long, embedding array<double>, tag string",
    )
    base = {
        r["vec_id"]: r["lsh_sig"]
        for r in random_hyperplane_signatures(emb, p1).collect()
    }
    for engine in ("pandas", "expr"):
        rows = random_hyperplane_signatures(
            emb, p1, engine=engine, carry_cols=["tag"]
        ).collect()
        assert {r["vec_id"]: r["lsh_sig"] for r in rows} == base
        assert {r["vec_id"]: r["tag"] for r in rows} == {1: "a", 2: "b"}


def test_embedding_incremental_multi_dump_loop(spark):
    """r13 (VERDICT item 4): the embedding operator's per-dump loop —
    the MinHash precedent (test_minhash_incremental_multi_dump_loop)
    applied to the vector family: start from an EMPTY store, three
    dumps, append each dump's keeps WITH their persisted lsh_sig (no
    re-signing); planted per-dump expectations plus the structural
    invariant that the final store is pairwise non-similar."""
    import numpy as np

    from solar_data_tools_spark.operators.dedup import (
        embedding_incremental_dedup,
    )
    from solar_data_tools_spark.operators.similarity import (
        random_hyperplane_signatures,
        seeded_hyperplanes,
    )

    planes = seeded_hyperplanes(16, 4, seed=42)
    kw = dict(threshold=0.9, method="lsh", planes=planes, max_hamming=8)
    store = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, lsh_sig long"
    )
    dumps = [
        # dump 1: 3 batch_dup of 1 (same direction), 2 independent
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0]),
         (3, [2.0, 0.0, 0.0, 0.0])],
        # dump 2: 11 store_dup of 1; 12 new; 13 batch_dup of 12
        [(11, [3.0, 0.1, 0.0, 0.0]), (12, [0.0, 0.0, 1.0, 0.0]),
         (13, [0.0, 0.0, 5.0, 0.1])],
        # dump 3: 21 store_dup of 2; 22 new
        [(21, [0.0, 9.0, 0.2, 0.0]), (22, [1.0, 1.0, 1.0, 1.0])],
    ]
    expected = {
        1: ("new", None), 2: ("new", None), 3: ("batch_dup", 1),
        11: ("store_dup", 1), 12: ("new", None), 13: ("batch_dup", 12),
        21: ("store_dup", 2), 22: ("new", None),
    }
    got = {}
    for rows in dumps:
        dump = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = embedding_incremental_dedup(dump, store, **kw)
        got.update(
            (r["vec_id"], (r["verdict"], r["matched_id"]))
            for r in out.collect()
        )
        # append = the keeps' vectors + their signatures, signed ONCE
        # here at admission (the analogue of the MinHash loop's
        # carried-signature append)
        keeps = dump.join(
            out.where("keep").select("vec_id"), "vec_id", "left_semi"
        )
        store = store.unionByName(
            random_hyperplane_signatures(keeps, planes)
        ).localCheckpoint(eager=True)
    assert got == expected

    # final store pairwise non-similar under the operator's criterion
    pdf = store.toPandas()
    mat = np.stack(pdf.embedding.to_numpy())
    nrm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = nrm @ nrm.T
    np.fill_diagonal(cos, 0.0)
    assert cos.max() < 0.9
    assert sorted(pdf.vec_id) == [1, 2, 12, 22]


def test_streaming_vector_store_dedup_matches_batch(spark, tmp_path):
    """r13: the streaming vector face's STORE dimension must agree
    with the batch operator (same planes, same threshold): streaming
    store_dup set == batch store_dup set with equal matched ids; batch
    batch_dups surface as streaming 'new' (the documented batch-
    epilogue boundary), and degenerate vectors are dropped."""
    import pandas as pd

    from solar_data_tools_spark.operators.dedup import (
        embedding_incremental_dedup,
    )
    from solar_data_tools_spark.operators.similarity import (
        seeded_hyperplanes,
    )
    from solar_data_tools_spark.streaming.dedup_stream import (
        streaming_vector_store_dedup,
    )

    planes = seeded_hyperplanes(16, 4, seed=1)
    store = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "doc_id long, embedding array<double>",
    )
    new_rows = [
        (10, [2.0, 0.0, 0.0, 0.0]),   # store_dup -> 1
        (11, [0.0, 5.0, 0.1, 0.0]),   # store_dup -> 2
        (12, [0.0, 0.0, 1.0, 0.0]),   # new
        (13, [0.0, 0.0, 2.0, 0.0]),   # batch: batch_dup; stream: new
        (14, [0.0, 0.0, 0.0, 0.0]),   # degenerate: dropped
    ]
    kw = dict(threshold=0.9, planes=planes, max_hamming=8)
    batch = {
        r["doc_id"]: (r["verdict"], r["matched_id"])
        for r in embedding_incremental_dedup(
            spark.createDataFrame(
                new_rows, "doc_id long, embedding array<double>"
            ),
            store, id_col="doc_id", method="lsh", **kw,
        ).collect()
    }

    src = str(tmp_path / "vecstore_stream_src")
    ts = pd.Timestamp("2024-06-01 12:00:00")
    spark.createDataFrame(
        pd.DataFrame(
            [(i, v, ts) for i, v in new_rows],
            columns=["doc_id", "embedding", "ingest_ts"],
        )
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, embedding array<double>, ingest_ts timestamp"
    ).parquet(src)
    q = (
        streaming_vector_store_dedup(stream, store, **kw)
        .writeStream.format("memory")
        .queryName("vecstore_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r["doc_id"]: (r["verdict"], r["matched_id"])
        for r in spark.sql("select * from vecstore_stream_test").collect()
    }
    assert set(streamed) == set(batch)  # 14 dropped by BOTH
    for doc, (bv, bm) in batch.items():
        sv, sm = streamed[doc]
        if bv == "store_dup":
            assert (sv, sm) == ("store_dup", bm), doc
        else:  # batch 'batch_dup' and 'new' both stream as 'new'
            assert (sv, sm) == ("new", None), doc
    assert batch[13][0] == "batch_dup"  # the documented boundary
