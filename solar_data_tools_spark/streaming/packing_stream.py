"""Streaming sequence packing — the ingestion-time counterpart of
``operators/sampling.pack_sequences`` (concat-then-chunk context-window
packing), as a custom stateful operator.

Unlike dedup/sessionization (which the built-in stateful operators
cover), packing needs *custom* state: the running token total of each
source's stream, carried across micro-batches. This is the
``applyInPandasWithState`` case: state is one long per source, sharded
by group key across executors exactly like any keyed state store entry,
so 1000 sources cost 1000 longs of state — independent of history.

Ordering contract: documents are packed in (micro-batch, ``order_col``)
order — i.e. arrival order, with ``order_col`` breaking ties inside a
batch. When the stream delivers documents in ``order_col`` order (e.g.
a replayed, sorted backlog or a monotonically-keyed ingest), the
assignment is IDENTICAL to the batch operator — certified by the
streaming==batch test. Out-of-order arrival packs in arrival order,
which is the only causally possible semantics for an online packer.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "doc_id long, source string, n_tokens long, "
    "pack_id long, offset_in_pack long"
)
STATE_SCHEMA = "total long"


def streaming_pack_sequences(
    stream: DataFrame,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Assign each arriving document its pack id / token offset in the
    per-``group_col`` concatenated stream, carrying the running token
    total in keyed state across micro-batches."""
    if token_col is None:
        toks = (
            F.when(F.length(F.trim(F.col(text_col))) == 0, 0)
            .otherwise(
                F.size(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
            )
            .cast("long")
        )
    else:
        toks = F.col(token_col).cast("long")
    prepared = stream.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("source"),
        F.col(order_col).alias("_ord"),
        toks.alias("n_tokens"),
    )

    budget_i = int(budget)

    def pack(
        key: Any, pdfs: Iterator, state: GroupState
    ) -> Iterator:
        import pandas as pd

        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            pdf = pdf.sort_values("_ord", kind="mergesort")
            n = pdf["n_tokens"].astype("int64")
            starts = total + n.cumsum() - n
            total = int(total + n.sum())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "n_tokens": n,
                    "pack_id": (starts // budget_i).astype("int64"),
                    "offset_in_pack": (starts % budget_i).astype("int64"),
                }
            )
        state.update((total,))

    return prepared.groupBy("source").applyInPandasWithState(
        pack,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
