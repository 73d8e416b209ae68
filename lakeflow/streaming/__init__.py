from lakeflow.streaming.pipeline import (
    dedup_within_watermark,
    sessionized_counts,
    stream_ndjson,
    upsert_foreach_batch,
    windowed_counts,
)

__all__ = [
    "stream_ndjson",
    "windowed_counts",
    "sessionized_counts",
    "dedup_within_watermark",
    "upsert_foreach_batch",
]
