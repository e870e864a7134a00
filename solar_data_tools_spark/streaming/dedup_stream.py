"""Streaming deduplication — the ingestion-time counterpart of the batch
dedup family (operators/dedup.py) for training-data pipelines.

Two built-in stateful operators cover the streaming cases without a
custom ``applyInPandasWithState`` handler (state stays JVM-side in the
state store, so a 1000-executor cluster shards dedup state by key hash):

- ``streaming_exact_dedup`` — drop rows whose content hash was already
  seen within the watermark horizon (``dropDuplicatesWithinWatermark``:
  bounded state; an exact duplicate arriving later than the horizon is
  the batch layer's job, consistent with this engine's
  streaming-approximates / batch-is-truth contract).
- ``streaming_first_seen`` — per (tumbling window, content hash):
  first-seen timestamp and copy count (duplication telemetry); the
  window in the grouping key keeps the aggregation state evictable.

State sizing at 100 TB: state is one (hash, timestamp) entry per
distinct key inside the watermark window — independent of total history
length, linear in arrival rate x horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_hash(text_col: str = "text"):
    """64-bit content fingerprint of the normalized text (same
    normalization as the batch exact-dedup operator)."""
    from solar_data_tools_spark.operators.dedup import normalize_text

    return F.xxhash64(normalize_text(F.col(text_col)))


def streaming_exact_dedup(
    stream: DataFrame,
    ts_col: str = "ingest_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each distinct (normalized) document
    within the watermark horizon; later copies are dropped."""
    return (
        stream.withColumn("content_hash", content_hash(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def streaming_first_seen(
    stream: DataFrame,
    ts_col: str = "ingest_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
    window: str = "1 hour",
) -> DataFrame:
    """Duplication telemetry: one row per (tumbling window, distinct
    document) with first-seen timestamp and copy count.

    The time window is in the grouping key — that is what makes the
    state watermark-EVICTABLE (a bare groupBy(content_hash) aggregation
    keeps one state entry per distinct hash over all history and never
    expires it, and Spark rejects append output for it). Copies of the
    same document in different windows produce one row each; cross-
    window dedup is ``streaming_exact_dedup``'s job."""
    return (
        stream.withColumn("content_hash", content_hash(text_col))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), "content_hash")
        .agg(
            F.min(ts_col).alias("first_ts"),
            F.count("*").alias("n_copies"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "content_hash",
            "first_ts",
            "n_copies",
        )
    )


def streaming_url_dedup(
    stream: DataFrame,
    ts_col: str = "ingest_ts",
    url_col: str = "url",
    watermark: str = "1 hour",
) -> DataFrame:
    """Ingest-time URL dedup: keep ONE record per CANONICAL URL within
    the watermark horizon — the streaming face of the batch
    ``urls.url_dedup`` (a crawler re-fetching a page under tracking-param
    / www. / trailing-slash variants produces one ingested record).
    Across microbatches the earlier batch's record wins; WITHIN a
    microbatch ``dropDuplicatesWithinWatermark`` keeps an arbitrary
    (processing-order) copy, not necessarily the earliest event time —
    use the batch ``url_dedup`` when a specific survivor matters.

    Same bounded-state argument as ``streaming_exact_dedup``: state is
    one 128-bit key per distinct canonical URL inside the watermark
    window, evicted as event time advances. The key is ``md5`` of the
    canonical URL, NOT a 64-bit hash: at crawl scale (billions of
    distinct URLs inside a long watermark) 64-bit birthday collisions
    become non-negligible and each one silently DROPS a distinct URL;
    at 128 bits the collision probability stays ~1e-20 even at 10^9
    keys, for 8 extra state bytes per entry."""
    from solar_data_tools_spark.operators.urls import canonicalize_url

    return (
        stream.withColumn(
            "canon_hash", F.md5(canonicalize_url(F.col(url_col)))
        )
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["canon_hash"])
    )


def streaming_chunk_dedup(
    stream: DataFrame,
    ts_col: str = "ingest_ts",
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 24,
    watermark: str = "1 hour",
) -> DataFrame:
    """Ingest-time CHUNK-level dedup — the streaming face of the q154
    batch composition: documents chunk as they arrive (chunking is a
    stateless row-local projection), and the first occurrence of every
    chunk hash within the watermark horizon survives. RAG ingestion
    uses exactly this to avoid indexing the boilerplate passage shared
    by every page of a site twice.

    State is one 128-bit chunk md5 per distinct chunk inside the
    watermark window (same bounded-state / collision argument as
    ``streaming_url_dedup``), evicted as event time advances. Emits the
    surviving chunks: (id_col, chunk_id, start_tok, n_tok, chunk_md5,
    ts_col). Across microbatches the earlier batch's chunk wins; within
    one, an arbitrary copy — use the batch composition when a specific
    canonical owner matters.
    """
    from solar_data_tools_spark.operators.curation import chunk_documents

    with_ts = chunk_documents(
        stream.select(id_col, text_col, ts_col),
        window=window,
        stride=stride,
        id_col=id_col,
        text_col=text_col,
        carry_cols=[ts_col],  # event time rides the row-local explode
    )
    return (
        with_ts.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["chunk_md5"])
    )


def streaming_signature_store_dedup(
    stream: DataFrame,
    signature_store: DataFrame,
    ts_col: str = "ingest_ts",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 8,
    n: int = 1,
    sim_threshold: float = 0.7,
    watermark: str = "1 hour",
    window: str = "1 hour",
) -> DataFrame:
    """Ingest-time near-dup against a persisted MinHash signature store
    — the streaming face of ``dedup.minhash_incremental_dedup``'s
    HISTORY dimension: each arriving doc is signed row-locally
    (``minhash_signature_expr`` — stateless, bit-identical to the batch
    md5_u31 family), banded, joined against the STATIC store on the
    band-bucket keys, and verdicted ``history_dup`` (>= ceil(t*k)
    matching signature components with some colliding store row, with
    the min matching store id) or ``new``.

    One row per (tumbling event-time window, doc). The window in the
    grouping key is what bounds the state: the per-doc candidate
    aggregation is evicted as event time passes the watermark — the
    same bounded-state argument as ``streaming_first_seen``.

    Deliberately NOT covered here (the streaming-approximates /
    batch-is-truth contract): within-stream ``snapshot_dup``
    canonicalization — a stream-stream self-join keyed on arbitrary
    band collisions has no watermark-boundable join condition, so
    within-dump canonicalization stays the batch epilogue
    (``minhash_incremental_dedup`` over the microbatch outputs, or the
    dump-close batch run that also appends the keeps to the store).

    Scale shape: the store side is a static table — Spark plans a
    stream-static join, re-reading only the store's narrow
    (id, signature) projection per microbatch (bucket the store by the
    band keys to make that a co-located lookup). Stream-side state is
    one aggregation row per in-flight (window, doc).
    """
    import math

    from solar_data_tools_spark.operators.dedup import (
        minhash_signature_expr,
    )

    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands "
            f"({bands})"
        )
    r = num_hashes // bands
    min_equal = math.ceil(sim_threshold * num_hashes)

    signed = stream.select(
        F.col(id_col),
        F.col(ts_col),
        minhash_signature_expr(text_col, num_hashes, n).alias("signature"),
    ).where(F.col("signature").isNotNull())
    banded = signed.select(
        F.col(id_col),
        F.col(ts_col),
        F.col("signature"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band_ix"),
    ).select(
        F.col(id_col),
        F.col(ts_col),
        F.col("signature"),
        "band_ix",
        F.xxhash64(
            F.expr(f"slice(signature, band_ix * {r} + 1, {r})"),
            F.col("band_ix"),
        ).alias("band_hash"),
    )
    # same geometry guard the batch operator's _banded treats as
    # essential, wrapped around a JOIN KEY (band_ix) so it fires even
    # when no bucket collides: a store signed with a different
    # num_hashes would otherwise band over empty/short slices and
    # silently stream every doc as 'new'
    store_banded = signature_store.select(
        F.col(id_col).alias("_sid"),
        F.col("signature").alias("_ssig"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band_ix"),
    ).select(
        "_sid",
        "_ssig",
        F.when(F.size("_ssig") == num_hashes, F.col("band_ix"))
        .otherwise(
            F.raise_error(
                F.format_string(
                    "minhash signature length %s != num_hashes "
                    + str(num_hashes),
                    F.size("_ssig").cast("string"),
                )
            )
        )
        .alias("band_ix"),
        F.xxhash64(
            F.expr(f"slice(_ssig, band_ix * {r} + 1, {r})"),
            F.col("band_ix"),
        ).alias("band_hash"),
    )
    n_eq = None
    for i in range(num_hashes):
        term = F.when(
            F.element_at("signature", i + 1) == F.element_at("_ssig", i + 1),
            1,
        ).otherwise(0)
        n_eq = term if n_eq is None else n_eq + term
    joined = banded.join(
        store_banded, on=["band_ix", "band_hash"], how="left"
    ).select(
        F.col(id_col),
        F.col(ts_col),
        F.when(n_eq >= min_equal, F.col("_sid")).alias("_match"),
    )
    return (
        joined.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(id_col))
        .agg(F.min("_match").alias("matched_id"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col(id_col),
            F.when(F.col("matched_id").isNotNull(), F.lit("history_dup"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
            "matched_id",
        )
    )

def streaming_vector_store_dedup(
    stream: DataFrame,
    vector_store: DataFrame,
    ts_col: str = "ingest_ts",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    planes: list[list[float]] | None = None,
    max_hamming: int = 6,
    watermark: str = "1 hour",
    window: str = "1 hour",
) -> DataFrame:
    """Ingest-time near-dup against a persisted VECTOR store — the
    embedding-family sibling of ``streaming_signature_store_dedup``
    (the streaming face of ``dedup.embedding_incremental_dedup``'s
    STORE dimension): each arriving vector is signed ROW-LOCALLY with
    the hyperplane family (``random_hyperplane_signatures`` engine
    "expr" — a stateless projection, same bits as the batch pandas
    engine), banded, joined against the STATIC store on the band
    buckets with the pigeonhole Hamming prefilter, and candidates are
    verified with the EXACT cosine — verdict ``store_dup`` (min
    matching store id) or ``new`` per (tumbling event-time window,
    id). Use ``similarity.seeded_hyperplanes`` and persist the seed so
    every dump and the store sign with the SAME family.

    Same documented boundaries as the MinHash face: within-stream
    ``batch_dup`` canonicalization is the batch epilogue
    (``embedding_incremental_dedup`` over the microbatch outputs), and
    rows with NULL/all-zero vectors are DROPPED (no cosine direction —
    the batch operator's r13 contract). If the store carries a
    persisted ``lsh_sig`` column it is used as-is; store vectors are
    only read to verify band-colliding candidates. PERSIST that column
    in production: a stream-static join re-evaluates the static side
    every micro-batch, so a store WITHOUT ``lsh_sig`` pays the
    mapInPandas signing pass per batch, not once (the MinHash face has
    the same property — see its bucketing note).

    Scale shape: stream-static joins only (no stream-stream state);
    the stream side carries its vector through the small band explode
    (x ``max_hamming + 1`` rows per doc — bounded, ingest-time), the
    store side contributes (id, sig) plus vectors for collision rows;
    state is one aggregation row per in-flight (window, doc)."""
    from solar_data_tools_spark.operators.similarity import (
        _band_layout,
        _banded_bits,
        cosine,
        random_hyperplane_signatures,
    )

    if planes is None:
        raise ValueError(
            "streaming_vector_store_dedup requires the hyperplane "
            "family (see similarity.seeded_hyperplanes)"
        )
    n_bits = len(planes)
    if max_hamming >= n_bits:
        raise ValueError("max_hamming must be < number of hyperplanes")
    layout = _band_layout(n_bits, max_hamming + 1)
    nondeg = F.col(vec_col).isNotNull() & F.exists(
        F.col(vec_col), lambda x: x != F.lit(0.0)
    )

    signed = random_hyperplane_signatures(
        stream.where(nondeg).select(id_col, ts_col, vec_col),
        planes,
        id_col,
        vec_col,
        engine="expr",  # stateless projection: stream-legal signing
        carry_cols=[ts_col],
    )
    banded = signed.select(
        F.col(id_col),
        F.col(ts_col),
        F.col(vec_col).alias("_vn"),
        F.col("lsh_sig"),
        F.explode(_banded_bits(F.col("lsh_sig"), layout)).alias("band"),
    )
    store_nd = vector_store.where(nondeg)
    if "lsh_sig" in vector_store.columns:
        store_sig = store_nd.select(
            F.col(id_col).alias("_sid"),
            F.col(vec_col).alias("_vs"),
            F.col("lsh_sig").alias("_ssig"),
        )
    else:
        store_sig = random_hyperplane_signatures(
            store_nd.select(id_col, vec_col), planes, id_col, vec_col
        ).select(
            F.col(id_col).alias("_sid"),
            F.col(vec_col).alias("_vs"),
            F.col("lsh_sig").alias("_ssig"),
        )
    store_banded = store_sig.select(
        "_sid",
        "_vs",
        "_ssig",
        F.explode(_banded_bits(F.col("_ssig"), layout)).alias("band"),
    )
    cos = cosine(
        F.col("_vn").cast("array<double>"),
        F.col("_vs").cast("array<double>"),
    )
    joined = (
        banded.join(store_banded, on=["band"], how="left")
        .select(
            F.col(id_col),
            F.col(ts_col),
            F.when(
                (
                    F.bit_count(
                        F.col("lsh_sig").bitwiseXOR(F.col("_ssig"))
                    )
                    <= F.lit(max_hamming)
                )
                & (cos >= F.lit(threshold)),
                F.col("_sid"),
            ).alias("_match"),
        )
    )
    return (
        joined.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(id_col))
        .agg(F.min("_match").alias("matched_id"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col(id_col),
            F.when(F.col("matched_id").isNotNull(), F.lit("store_dup"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
            "matched_id",
        )
    )
