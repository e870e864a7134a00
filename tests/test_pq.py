"""Product-quantization unit tests: trainer determinism + Lloyd's
improvement, encode/decode consistency, ADC distance exactness against
numpy, and input validation. The encode/ADC DuckDB oracles live in
test_oracle_parity.py (q141/q142)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from solar_data_tools_spark.operators import pq as pqm


def _emb(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/embeddings.parquet")


def _np_corpus(spark, sf_small):
    pdf = _emb(spark, sf_small).orderBy("vec_id").toPandas()
    return pdf["vec_id"].to_numpy(), np.stack(
        pdf["embedding"].to_numpy()
    ).astype(np.float64)


def test_trainer_shape_and_determinism(spark, sf_small):
    emb = _emb(spark, sf_small)
    b1 = pqm.train_pq_codebooks(emb, m=8, k=16, sample_cap=128, n_iters=3)
    b2 = pqm.train_pq_codebooks(
        emb.repartition(13), m=8, k=16, sample_cap=128, n_iters=3
    )
    assert b1.shape == (8, 16, 8)
    np.testing.assert_array_equal(b1, b2)  # partitioning-invariant


def test_lloyd_reduces_quantization_error(spark, sf_small):
    # train on the WHOLE corpus (sample_cap >= n) so Lloyd's monotone
    # objective decrease applies to the encoded set exactly
    emb = _emb(spark, sf_small)
    b0 = pqm.train_pq_codebooks(emb, m=8, k=16, sample_cap=4096, n_iters=0)
    b10 = pqm.train_pq_codebooks(emb, m=8, k=16, sample_cap=4096, n_iters=10)
    e0 = pqm.pq_encode(emb, b0).agg(F.sum("qerr")).collect()[0][0]
    e10 = pqm.pq_encode(emb, b10).agg(F.sum("qerr")).collect()[0][0]
    assert e10 <= e0
    assert e10 < 0.9 * e0  # and materially, not within noise


def test_encode_matches_numpy(spark, sf_small):
    emb = _emb(spark, sf_small)
    books = pqm.train_pq_codebooks(emb, m=8, k=16, sample_cap=128, n_iters=2)
    ids, mat = _np_corpus(spark, sf_small)
    rows = (
        pqm.pq_encode(emb, books)
        .orderBy("vec_id")
        .toPandas()
    )
    codes = np.stack(rows["codes"].to_numpy())
    qerr = rows["qerr"].to_numpy()
    m, k, ds = books.shape
    exp_codes = np.empty_like(codes)
    exp_err = np.zeros(len(mat))
    for j in range(m):
        sub = mat[:, j * ds : (j + 1) * ds]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        exp_codes[:, j] = np.argmin(d2, axis=1)
        exp_err += d2[np.arange(len(mat)), exp_codes[:, j]]
    np.testing.assert_array_equal(codes, exp_codes)
    np.testing.assert_allclose(qerr, exp_err, rtol=1e-9)


def test_decode_is_codeword_concat(spark, sf_small):
    emb = _emb(spark, sf_small).limit(20)
    books = pqm.train_pq_codebooks(emb, m=8, k=4, sample_cap=32, n_iters=1)
    enc = pqm.pq_encode(emb, books)
    dec = pqm.pq_decode(enc, books).orderBy("vec_id").toPandas()
    m, _, ds = books.shape
    for _, row in dec.iterrows():
        expect = np.concatenate([books[j][row["codes"][j]] for j in range(m)])
        np.testing.assert_allclose(np.asarray(row["decoded"]), expect)


def test_adc_topk_matches_numpy_and_excludes_self(spark, sf_small):
    emb = _emb(spark, sf_small)
    books = pqm.train_pq_codebooks(emb, m=8, k=16, sample_cap=128, n_iters=2)
    enc = pqm.pq_encode(emb, books)
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = (
        pqm.pq_adc_topk(enc, queries, books, k=5)
        .orderBy("query_id", "rank")
        .toPandas()
    )
    assert (got["vec_id"] != got["query_id"]).all()
    ids, mat = _np_corpus(spark, sf_small)
    m, k, ds = books.shape
    # numpy ADC: codes + per-query LUT
    codes = np.empty((len(mat), m), dtype=int)
    for j in range(m):
        sub = mat[:, j * ds : (j + 1) * ds]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    for qid in (0, 1):
        q = mat[ids == qid][0]
        lut = np.stack(
            [
                ((q[j * ds : (j + 1) * ds][None, :] - books[j]) ** 2).sum(
                    axis=1
                )
                for j in range(m)
            ]
        )
        dist = lut[np.arange(m)[None, :], codes].sum(axis=1)
        order = np.lexsort((ids, dist))
        expect = [i for i in ids[order] if i != qid][:5]
        sub = got[got["query_id"] == qid]
        assert list(sub["vec_id"]) == expect
        np.testing.assert_allclose(
            sub["adc_dist"].to_numpy(),
            np.sort(dist[np.isin(ids, expect)]),
            rtol=1e-9,
        )


def test_validation_errors(spark, sf_small):
    emb = _emb(spark, sf_small)
    with pytest.raises(ValueError, match="not divisible"):
        pqm.train_pq_codebooks(emb, m=7, k=4, sample_cap=16)
    with pytest.raises(ValueError, match="cannot seed"):
        pqm.train_pq_codebooks(emb, m=8, k=16, sample_cap=8)
    with pytest.raises(ValueError, match="must be"):
        pqm.pq_encode(emb, np.zeros((8, 16)))


def _build_small(spark, sf_small, **kw):
    emb = _emb(spark, sf_small)
    return emb, pqm.ivfpq_build(
        emb, n_cells=8, m=8, k=16, sample_cap=4096, n_iters=5, **kw
    )


def test_ivfpq_residual_beats_raw_distortion(spark, sf_small):
    """The point of coding residuals: same (m, k) budget, lower mean
    quantization error than raw-vector PQ."""
    emb = _emb(spark, sf_small)
    raw = pqm.train_pq_codebooks(emb, m=8, k=16, sample_cap=4096, n_iters=5)
    raw_err = pqm.pq_encode(emb, raw).agg(F.avg("qerr")).collect()[0][0]
    _, (_, _, codes) = _build_small(spark, sf_small)
    res_err = codes.agg(F.avg("qerr")).collect()[0][0]
    assert res_err < raw_err


def test_ivfpq_full_probe_matches_numpy_adc(spark, sf_small):
    """n_probe == n_cells scores EVERY vector with the residual-ADC
    metric; the ranking must equal the numpy-computed one exactly."""
    emb, (cent, books, codes) = _build_small(spark, sf_small)
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = (
        pqm.ivfpq_topk(codes, queries, cent, books, k=8, n_probe=8)
        .orderBy("query_id", "rank")
        .toPandas()
    )
    ids, mat = _np_corpus(spark, sf_small)
    cdf = codes.orderBy("vec_id").toPandas()
    cells = cdf["cell"].to_numpy()
    cvec = np.stack(cdf["codes"].to_numpy())
    m, k, ds = books.shape
    for qid in (0, 1):
        q = mat[ids == qid][0]
        dist = np.zeros(len(mat))
        for cell in range(len(cent)):
            qr = q - cent[cell]
            lut = np.stack(
                [
                    ((qr[j * ds : (j + 1) * ds][None, :] - books[j]) ** 2).sum(
                        axis=1
                    )
                    for j in range(m)
                ]
            )
            sel = cells == cell
            dist[sel] = lut[np.arange(m)[None, :], cvec[sel]].sum(axis=1)
        order = np.lexsort((ids, dist))
        expect = [i for i in ids[order] if i != qid][:8]
        sub = got[got["query_id"] == qid]
        assert list(sub["vec_id"]) == expect
        np.testing.assert_allclose(
            sub["adc_dist"].to_numpy(),
            np.sort(dist[np.isin(ids, expect)]),
            rtol=1e-9,
        )


def test_ivfpq_partial_probe_is_probed_cell_restriction(spark, sf_small):
    """n_probe = p results must equal the full-probe ADC ranking
    restricted to the query's p nearest cells — probing loses cells,
    never reorders them."""
    emb, (cent, books, codes) = _build_small(spark, sf_small)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = pqm.ivfpq_topk(
        codes, queries, cent, books, k=500, n_probe=8
    ).toPandas()
    part = (
        pqm.ivfpq_topk(codes, queries, cent, books, k=8, n_probe=2)
        .orderBy("query_id", "rank")
        .toPandas()
    )
    ids, mat = _np_corpus(spark, sf_small)
    for qid in range(3):
        q = mat[ids == qid][0]
        cd = ((cent - q[None, :]) ** 2).sum(axis=1)
        probed = set(np.argsort(cd, kind="stable")[:2])
        f = full[full["query_id"] == qid]
        expect = list(f[f["cell"].isin(probed)]["vec_id"])[:8]
        assert list(part[part["query_id"] == qid]["vec_id"]) == expect


def test_ivfpq_deterministic_across_partitioning(spark, sf_small):
    emb = _emb(spark, sf_small)
    c1, b1, k1 = pqm.ivfpq_build(
        emb, n_cells=4, m=4, k=8, sample_cap=256, n_iters=3
    )
    c2, b2, k2 = pqm.ivfpq_build(
        emb.repartition(11), n_cells=4, m=4, k=8, sample_cap=256, n_iters=3
    )
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(b1, b2)
    a = k1.orderBy("vec_id").toPandas()
    b = k2.orderBy("vec_id").toPandas()
    assert list(a["cell"]) == list(b["cell"])
    assert [list(x) for x in a["codes"]] == [list(x) for x in b["codes"]]


def test_encode_engines_agree(spark, sf_small):
    """pandas (scale path) and expr (oracle path) engines must produce
    identical codes and fp-equal qerr on the same codebooks."""
    emb = _emb(spark, sf_small)
    books = pqm.train_pq_codebooks(emb, m=8, k=16, sample_cap=128, n_iters=3)
    a = (
        pqm.pq_encode(emb, books, engine="pandas")
        .orderBy("vec_id")
        .toPandas()
    )
    b = (
        pqm.pq_encode(emb, books, engine="expr")
        .orderBy("vec_id")
        .toPandas()
    )
    assert [list(c) for c in a["codes"]] == [list(c) for c in b["codes"]]
    np.testing.assert_allclose(
        a["qerr"].to_numpy(), b["qerr"].to_numpy(), rtol=1e-9
    )
    with pytest.raises(ValueError, match="unknown engine"):
        pqm.pq_encode(emb, books, engine="nope")
