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
