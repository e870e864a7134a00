"""plans.ingest.ingest_dump — the composed per-dump production job.

What only THIS composition (not the standalone operators) must get
right, each asserted on a planted corpus: verdict precedence (first
failing stage wins), exact dups never reaching the signature join,
quality-rejected rows reaching no store, vacuous passes for
un-checkable rows (no embedding), and the delta plumbing that makes
the multi-dump loop closed (every delta appends in the store's own
layout with no re-signing).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from solar_data_tools_spark.operators.dedup import (
    minhash_band_store,
    minhash_signatures,
    normalize_text,
)
from solar_data_tools_spark.plans.ingest import ingest_dump

T_A = "alpha bravo charlie delta echo foxtrot golf hotel"
T_B = "kilo lima mike november oscar papa quebec romeo"
T_C = "uniform victor whiskey xray yankee zulu seven eight"
T_D = "red orange yellow green blue indigo violet cyan"
T_E = "gold silver bronze copper iron tin lead zinc"
T_F = "apple pear plum peach cherry grape mango lemon"
T_G = "one two three four five six nine ten"
T_SHORT = "tiny doc"

def _quality():
    # built lazily: Column construction needs an active SparkContext
    return F.size(F.split(normalize_text(F.col("text")), " ")) >= 5
KW = dict(num_hashes=64, bands=8, n=1, sim_threshold=0.7,
          token_hash="md5_u31")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, embedding array<double>"
    )


def _stores(spark, hist_rows, vec_rows):
    hist = _docs(spark, hist_rows)
    return dict(
        exact_store=hist.select(
            F.md5(normalize_text(F.col("text"))).alias("content_md5")
        ),
        minhash_store=minhash_signatures(
            hist, 64, 1, token_hash="md5_u31"
        ),
        vector_store=_vecs(spark, vec_rows),
    )


def test_ingest_dump_all_verdict_classes_and_deltas(spark):
    """One dump exercising every verdict class, with the precedence,
    vacuous-pass, and delta contracts asserted exactly."""
    stores = _stores(
        spark,
        [(1, T_A), (2, T_B)],
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
    )
    dump = _docs(spark, [
        (10, T_A),                 # exact_history_dup
        (11, T_C),                 # new (first of 11/12)
        (12, T_C),                 # exact_snapshot_dup -> 11
        (13, T_A + " extra"),      # minhash_history_dup -> 1
        (14, T_D),                 # new; NO embedding row (vacuous)
        (15, T_D + " extra"),      # minhash_snapshot_dup -> 14
        (16, T_SHORT),             # quality_rejected
        (17, T_E),                 # embedding_store_dup -> 1
        (18, T_F),                 # new (lower id of the 18/19 pair)
        (19, T_G),                 # embedding_batch_dup -> 18
    ])
    new_emb = _vecs(spark, [
        (11, [-1.0, 0.0]),         # checked, no match
        (13, [1.0, 0.0]),          # never reaches the stage (mh dup)
        (17, [2.0, 0.0]),          # cos=1 vs store id 1
        (18, [0.6, 0.8]),
        (19, [0.6, 0.8]),          # cos=1 vs 18; <0.9 vs both store
    ])
    out = ingest_dump(
        dump, new_embeddings=new_emb, quality_filter=_quality(),
        embedding_threshold=0.9, **stores, **KW,
    )
    got = {
        r["doc_id"]: (r["verdict"], r["matched_id"], r["keep"])
        for r in out["verdicts"].collect()
    }
    assert got == {
        10: ("exact_history_dup", None, False),
        11: ("new", None, True),
        12: ("exact_snapshot_dup", 11, False),
        13: ("minhash_history_dup", 1, False),
        14: ("new", None, True),
        15: ("minhash_snapshot_dup", 14, False),
        16: ("quality_rejected", None, False),
        17: ("embedding_store_dup", 1, False),
        18: ("new", None, True),
        19: ("embedding_batch_dup", 18, False),
    }

    # content_md5: NULL iff quality_rejected; signature: exactly the
    # docs that reached (and survived into) the MinHash stage
    rows = {r["doc_id"]: r for r in out["verdicts"].collect()}
    assert rows[16]["content_md5"] is None
    assert all(
        rows[i]["content_md5"] is not None for i in got if i != 16
    )
    signed = {i for i, r in rows.items() if r["signature"] is not None}
    assert signed == {11, 13, 14, 15, 17, 18, 19}  # not 10/12/16

    # deltas: exactly the keeps, and only the vector-CHECKED keeps in
    # the embedding delta (14 kept but un-checkable -> excluded)
    keeps = {i for i, (_, _, k) in got.items() if k}
    assert keeps == {11, 14, 18}
    assert out["exact_delta"].count() == 3
    assert {
        r["doc_id"] for r in out["minhash_delta"].collect()
    } == keeps
    assert {
        r["doc_id"] for r in out["embedding_delta"].collect()
    } == {11, 18}


def test_ingest_dump_multi_dump_loop_from_empty_stores(spark):
    """The production loop: dump 1 against EMPTY stores founds them,
    dump 2 runs against the appended deltas — no store is ever
    re-derived from text."""
    exact_store = spark.createDataFrame([], "content_md5 string")
    minhash_store = minhash_signatures(
        _docs(spark, []), 64, 1, token_hash="md5_u31"
    )
    vector_store = _vecs(spark, [])

    d1 = ingest_dump(
        _docs(spark, [(1, T_A), (2, T_B), (3, T_A)]),
        exact_store=exact_store, minhash_store=minhash_store,
        vector_store=vector_store,
        new_embeddings=_vecs(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])]),
        quality_filter=_quality(), embedding_threshold=0.9, **KW,
    )
    got1 = {
        r["doc_id"]: r["verdict"] for r in d1["verdicts"].collect()
    }
    assert got1 == {1: "new", 2: "new", 3: "exact_snapshot_dup"}

    exact_store = exact_store.unionByName(d1["exact_delta"])
    minhash_store = minhash_store.unionByName(
        d1["minhash_delta"]
    ).localCheckpoint(eager=True)
    vector_store = vector_store.unionByName(d1["embedding_delta"])

    d2 = ingest_dump(
        _docs(spark, [
            (11, T_A),             # exact_history_dup (dump-1 keep)
            (12, T_A + " extra"),  # minhash_history_dup -> 1
            (13, T_C),             # embedding_store_dup -> 1
            (14, T_D),             # new
        ]),
        exact_store=exact_store, minhash_store=minhash_store,
        vector_store=vector_store,
        new_embeddings=_vecs(spark, [
            (13, [100.0, 0.0]),    # cos=1 vs dump-1 keep id 1
            (14, [-0.7, 0.7]),
        ]),
        quality_filter=_quality(), embedding_threshold=0.9, **KW,
    )
    got2 = {
        r["doc_id"]: (r["verdict"], r["matched_id"])
        for r in d2["verdicts"].collect()
    }
    assert got2 == {
        11: ("exact_history_dup", None),
        12: ("minhash_history_dup", 1),
        13: ("embedding_store_dup", 1),
        14: ("new", None),
    }
    # the loop stays closed: stores grow by exactly the keeps
    assert d2["exact_delta"].count() == 1
    assert [r["doc_id"] for r in d2["minhash_delta"].collect()] == [14]
    assert [r["doc_id"] for r in d2["embedding_delta"].collect()] == [14]


def test_ingest_dump_banded_store_mode(spark):
    """store_is_banded=True: verdicts identical to the raw-store path
    and minhash_delta comes back IN the banded layout (geometry column
    included) so the append preserves the store's physical contract."""
    stores = _stores(
        spark, [(1, T_A), (2, T_B)], [(1, [1.0, 0.0])]
    )
    dump = _docs(spark, [(10, T_A + " extra"), (11, T_C), (12, T_C)])

    def run(**kw):
        out = ingest_dump(
            dump, quality_filter=_quality(), **kw, **KW,
        )
        return out, sorted(
            (r["doc_id"], r["verdict"], r["matched_id"])
            for r in out["verdicts"].collect()
        )

    _, raw = run(
        exact_store=stores["exact_store"],
        minhash_store=stores["minhash_store"],
    )
    banded_out, banded = run(
        exact_store=stores["exact_store"],
        minhash_store=minhash_band_store(
            stores["minhash_store"], bands=8, num_hashes=64
        ),
        store_is_banded=True,
    )
    assert banded == raw
    assert ("minhash_history_dup" in {v for _, v, _ in raw})
    delta_cols = set(banded_out["minhash_delta"].columns)
    assert {"band_ix", "band_hash", "band_r", "signature"} <= delta_cols


def test_ingest_dump_stage_skips_and_input_validation(spark):
    """None skips a stage (documented); half-supplied embedding inputs
    raise."""
    dump = _docs(spark, [(1, T_A), (2, T_A)])
    out = ingest_dump(dump, quality_filter=_quality())
    got = {r["doc_id"]: r["verdict"] for r in out["verdicts"].collect()}
    # exact stage always runs (within-dump canonicalization is free)
    assert got == {1: "new", 2: "exact_snapshot_dup"}
    assert "embedding_delta" not in out
    assert out["minhash_delta"].count() == 0  # nothing signed

    with pytest.raises(ValueError, match="embedding stage"):
        ingest_dump(
            dump, vector_store=_vecs(spark, [(1, [1.0])]),
        )
