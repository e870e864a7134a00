"""Structured Streaming layer.

The reference is strictly batch (SURVEY.md §2.11) — whole-series solves
can't stream. What CAN incrementalize is the ingest -> daily-score layer:
tumbling 1-day windows with a watermark. This module provides that
skeleton; the solver layer stays batch-recompute by design.
"""

from solar_data_tools_spark.streaming.daily_stream import streaming_daily_stats  # noqa: F401
from solar_data_tools_spark.streaming.sessions_stream import streaming_sessionize  # noqa: F401
from solar_data_tools_spark.streaming.dedup_stream import (  # noqa: F401
    streaming_exact_dedup,
    streaming_first_seen,
    streaming_chunk_dedup,
    streaming_url_dedup,
)
from solar_data_tools_spark.streaming.packing_stream import (  # noqa: F401
    streaming_pack_sequences,
)
from solar_data_tools_spark.streaming.sketch_stream import (  # noqa: F401
    streaming_bloom,
    streaming_cms,
    streaming_hll,
)
