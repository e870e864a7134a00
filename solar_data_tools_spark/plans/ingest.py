"""The composed per-dump ingest job — the ONE job a production crawl
pipeline runs when a new dump arrives (VERDICT r12 item 1): quality
gate -> exact incremental dedup -> MinHash incremental dedup ->
(optional) embedding incremental dedup, each stage against its own
PERSISTED store, emitting one unified verdict table plus the store
deltas the keeps contribute.

The three incremental families exist — and are each externally
oracle-certified — as standalone operators (exact: q117's shape;
MinHash: ``dedup.minhash_incremental_dedup`` q182/q183; embedding:
``dedup.embedding_incremental_dedup`` q184). What a standalone operator
CANNOT certify is the stage interactions, and those are exactly where a
hand-wired pipeline goes wrong in production:

* exact duplicates must NOT reach the signature join — both for cost
  (candidate generation for bit-identical copies is pure waste) and for
  semantics (the MinHash stage's within-dump min-id canonicalization is
  defined over EXACT SURVIVORS; including exact dups shifts matched
  ids);
* quality-rejected rows must not be hashed into any store (a rejected
  doc's hash in the exact store would shadow a future GOOD copy);
* each store delta must contain exactly the keeps, in the store's own
  layout, so the next dump's run sees precisely the accumulated corpus.

This composition is itself oracle-certified end-to-end (q185: the q105
chained-oracle pattern over the q117 + q182 + q184 SQL shapes).

Reference parity: solar-data-tools has no corpus tier; this is the
north-star extension's per-dump production form (the composed
counterpart of ``curation.curate_corpus``, which certifies the same
pattern for the one-shot batch tier — curation.py:393, q105).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ingest_dump(
    new_docs: DataFrame,
    exact_store: DataFrame | None = None,
    minhash_store: DataFrame | None = None,
    vector_store: DataFrame | None = None,
    new_embeddings: DataFrame | None = None,
    quality_filter: Column | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: list[str] | None = None,
    num_hashes: int = 64,
    bands: int = 8,
    n: int = 1,
    sim_threshold: float = 0.7,
    token_hash: str = "md5_u31",
    store_is_banded: bool = False,
    vec_col: str = "embedding",
    embedding_threshold: float = 0.9,
    embedding_method: str = "exact",
    planes: list[list[float]] | None = None,
    max_hamming: int = 6,
    materialize: str = "local",
) -> dict[str, DataFrame]:
    """Run one dump through the full incremental curation chain.

    Inputs (all stores optional — ``None`` SKIPS that stage entirely;
    for the very first dump pass EMPTY stores (zero rows, the right
    schema) instead, which keeps each stage's within-dump
    canonicalization and its delta — the multi-dump loop tests start
    exactly that way):

    * ``new_docs`` — this dump (``id_col``, ``text_col``, blocks...);
    * ``exact_store`` — one ``content_md5`` column: the distinct
      normalized-text hashes of every KEPT historical doc;
    * ``minhash_store`` — ``minhash_signatures`` rows (raw layout) or
      the ``minhash_band_store`` layout with ``store_is_banded=True``;
    * ``vector_store`` / ``new_embeddings`` — (``id_col``, ``vec_col``)
      frames for the embedding stage; ``new_embeddings`` carries this
      dump's vectors keyed by the SAME ids as ``new_docs`` (docs
      without a vector row simply skip the stage).

    Verdict per input doc, first failing stage wins (each stage only
    sees the previous stage's survivors):

      ``quality_rejected`` -> ``exact_history_dup`` (hash in store;
      matched_id NULL — the exact store is hash-only by design) ->
      ``exact_snapshot_dup`` (later copy within the dump; matched_id =
      lowest id of the hash group) -> ``minhash_history_dup`` /
      ``minhash_snapshot_dup`` (signature-estimated, matched_id = min
      matching id) -> ``embedding_store_dup`` / ``embedding_batch_dup``
      (cosine >= threshold, matched_id = min matching id) -> ``new``.

    ``keep`` is ``verdict == 'new'``. Docs the MinHash stage cannot
    sign (no shingles — only possible when the quality gate admits
    near-empty text) and docs with no / degenerate embedding rows pass
    their stage vacuously: un-checkable is KEPT, and excluded from the
    store delta that could not check it.

    Returns ``{"verdicts", "exact_delta", "minhash_delta"[,
    "embedding_delta"]}``:

    * ``verdicts`` — one row per input doc: (id, blocks..., verdict,
      matched_id, keep, content_md5 [NULL iff quality_rejected],
      signature [non-NULL iff the doc was signed]);
    * ``exact_delta`` — distinct ``content_md5`` of the keeps (append
      to ``exact_store``);
    * ``minhash_delta`` — the keeps' carried signatures, in the SAME
      layout the store was supplied in (banded iff
      ``store_is_banded``) — no re-signing, no re-banding drift;
    * ``embedding_delta`` (embedding stage only) — the keeps'
      (id, vec) rows that were actually vector-checked.

    Scale shape (each stage keeps its certified standalone plan):
    stage order is cheapest-first and every stage SHRINKS the frame the
    next one signs/joins — the quality gate fuses into the scan, the
    exact stage shuffles only (id, md5) pairs, and the MinHash/embedding
    stages inherit their operators' O(dump) store contracts (narrow
    store projections, banded candidate joins, text/vectors never
    shuffled store-wide). The exact-survivor frame fans out to the
    MinHash signer and the verdict union, so it is materialized once
    (``materialize`` — same none/local/reliable contract as fleet and
    pipeline plans).
    """
    from solar_data_tools_spark.operators.dedup import (
        embedding_incremental_dedup,
        minhash_band_store,
        minhash_incremental_dedup,
        normalize_text,
    )
    from solar_data_tools_spark.session import materialize_df

    blocks = block_cols or []
    base_cols = [id_col, *blocks]

    # --- stage 1: quality gate (row-local, fuses into the scan) ------
    if quality_filter is not None:
        gated = new_docs.withColumn("_q_ok", quality_filter)
    else:
        gated = new_docs.withColumn("_q_ok", F.lit(True))
    passed = gated.where(F.col("_q_ok"))
    rejected = gated.where(~F.col("_q_ok")).select(
        *[F.col(c) for c in base_cols],
        F.lit("quality_rejected").alias("verdict"),
        F.lit(None).cast("bigint").alias("matched_id"),
        F.lit(False).alias("keep"),
        F.lit(None).cast("string").alias("content_md5"),
    )

    # --- stage 2: exact incremental (q117's shape) -------------------
    # only (id, md5) pairs ride the shuffles; the store side is a
    # distinct-hash projection, deliberately not broadcast-hinted (the
    # accumulated hash set at crawl scale is itself huge; AQE still
    # broadcasts a small one)
    hashed = passed.withColumn(
        "content_md5", F.md5(normalize_text(F.col(text_col)))
    )
    if exact_store is not None:
        store_h = exact_store.select("content_md5").distinct().withColumn(
            "_in_store", F.lit(True)
        )
        hashed = hashed.join(store_h, "content_md5", "left")
    else:
        hashed = hashed.withColumn("_in_store", F.lit(None).cast("boolean"))
    firsts = hashed.groupBy("content_md5").agg(
        F.min(id_col).alias("_first_id")
    )
    exact = hashed.join(firsts, "content_md5").select(
        *[F.col(c) for c in base_cols],
        F.col(text_col),
        F.col("content_md5"),
        F.when(F.col("_in_store"), F.lit("exact_history_dup"))
        .when(F.col(id_col) > F.col("_first_id"), F.lit("exact_snapshot_dup"))
        .alias("_exact_verdict"),
        F.when(
            F.col("_in_store").isNull()
            & (F.col(id_col) > F.col("_first_id")),
            F.col("_first_id"),
        ).cast("bigint").alias("_exact_match"),
    )
    # the exact-survivor frame fans out (MinHash signer + verdict
    # union + delta projections) — truncate its lineage once
    exact = materialize_df(exact, materialize)
    ek = exact.where(F.col("_exact_verdict").isNull())
    exact_dups = exact.where(F.col("_exact_verdict").isNotNull()).select(
        *[F.col(c) for c in base_cols],
        F.col("_exact_verdict").alias("verdict"),
        F.col("_exact_match").alias("matched_id"),
        F.lit(False).alias("keep"),
        F.col("content_md5"),
    )

    # --- stage 3: MinHash incremental over EXACT SURVIVORS only ------
    if minhash_store is not None:
        mh = minhash_incremental_dedup(
            ek.select(*base_cols, text_col),
            minhash_store,
            num_hashes=num_hashes,
            bands=bands,
            n=n,
            sim_threshold=sim_threshold,
            id_col=id_col,
            text_col=text_col,
            block_cols=blocks or None,
            token_hash=token_hash,
            materialize=materialize,
            store_is_banded=store_is_banded,
        )
        mh = materialize_df(
            mh.select(
                F.col(id_col),
                F.col("signature"),
                F.when(F.col("verdict") == "history_dup",
                       F.lit("minhash_history_dup"))
                .when(F.col("verdict") == "snapshot_dup",
                      F.lit("minhash_snapshot_dup"))
                .alias("_mh_verdict"),
                F.col("matched_id").cast("bigint").alias("_mh_match"),
            ),
            materialize,
        )
        # left join: unsigned docs (no shingles) pass vacuously
        staged = ek.join(mh, id_col, "left")
    else:
        staged = (
            ek.withColumn("signature", F.lit(None).cast("array<bigint>"))
            .withColumn("_mh_verdict", F.lit(None).cast("string"))
            .withColumn("_mh_match", F.lit(None).cast("bigint"))
        )
    mk = staged.where(F.col("_mh_verdict").isNull())

    # --- stage 4: embedding incremental over MINHASH SURVIVORS -------
    if vector_store is not None or new_embeddings is not None:
        if vector_store is None or new_embeddings is None:
            raise ValueError(
                "the embedding stage needs BOTH vector_store and "
                "new_embeddings (pass neither to skip it)"
            )
        emb_in = new_embeddings.select(id_col, vec_col).join(
            mk.select(id_col), id_col, "left_semi"
        )
        ev = embedding_incremental_dedup(
            emb_in,
            vector_store,
            threshold=embedding_threshold,
            id_col=id_col,
            vec_col=vec_col,
            method=embedding_method,
            planes=planes,
            max_hamming=max_hamming,
        )
        ev = materialize_df(
            ev.select(
                F.col(id_col),
                F.when(F.col("verdict") == "store_dup",
                       F.lit("embedding_store_dup"))
                .when(F.col("verdict") == "batch_dup",
                      F.lit("embedding_batch_dup"))
                .alias("_em_verdict"),
                F.col("matched_id").cast("bigint").alias("_em_match"),
                # the rows the stage actually checked (degenerate /
                # missing vectors never appear here) — gates the delta
                F.lit(True).alias("_em_checked"),
            ),
            materialize,
        )
        staged = staged.join(ev, id_col, "left")
    else:
        staged = staged.withColumn(
            "_em_verdict", F.lit(None).cast("string")
        ).withColumn("_em_match", F.lit(None).cast("bigint")).withColumn(
            "_em_checked", F.lit(None).cast("boolean")
        )

    survivor_verdicts = staged.select(
        *[F.col(c) for c in base_cols],
        F.coalesce(
            F.col("_mh_verdict"), F.col("_em_verdict"), F.lit("new")
        ).alias("verdict"),
        F.coalesce(F.col("_mh_match"), F.col("_em_match")).alias(
            "matched_id"
        ),
        (
            F.col("_mh_verdict").isNull() & F.col("_em_verdict").isNull()
        ).alias("keep"),
        F.col("content_md5"),
        F.col("signature"),
    )
    verdicts = (
        rejected.withColumn(
            "signature", F.lit(None).cast("array<bigint>")
        )
        .unionByName(
            exact_dups.withColumn(
                "signature", F.lit(None).cast("array<bigint>")
            )
        )
        .unionByName(survivor_verdicts)
    )
    verdicts = materialize_df(verdicts, materialize)

    keeps = verdicts.where(F.col("keep"))
    out: dict[str, DataFrame] = {
        "verdicts": verdicts,
        "exact_delta": keeps.select("content_md5").distinct(),
    }
    mh_delta = keeps.where(F.col("signature").isNotNull()).select(
        *base_cols, "signature"
    )
    if store_is_banded:
        mh_delta = minhash_band_store(
            mh_delta,
            bands=bands,
            num_hashes=num_hashes,
            id_col=id_col,
            block_cols=blocks or None,
        )
    out["minhash_delta"] = mh_delta
    if vector_store is not None:
        out["embedding_delta"] = (
            new_embeddings.select(id_col, vec_col)
            .join(
                staged.where(
                    F.col("_em_checked")
                    & F.col("_mh_verdict").isNull()
                    & F.col("_em_verdict").isNull()
                ).select(id_col),
                id_col,
                "left_semi",
            )
        )
    return out
