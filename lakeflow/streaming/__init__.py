from lakeflow.streaming.pipeline import (
    dedup_within_watermark,
    sessionized_counts,
    stream_ndjson,
    upsert_foreach_batch,
    windowed_counts,
    windowed_drift,
)

__all__ = [
    "stream_ndjson",
    "windowed_counts",
    "windowed_drift",
    "sessionized_counts",
    "dedup_within_watermark",
    "upsert_foreach_batch",
]
