"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.10 "stateful dedup"/custom operators).

The built-in stateful operators (windows, dropDuplicatesWithinWatermark)
cover the reference's needs; this is the escape hatch for per-key state
machines they cannot express — running counters, funnels, anomaly
flags. State lives in the state store (checkpointed, restart-safe);
the watermark/timeout bounds its lifetime, which is what keeps per-key
state viable across 100 TB of events.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNTER_OUTPUT_SCHEMA = "user_id long, batch_events long, total_events long"
COUNTER_STATE_SCHEMA = "total long"


def _counter_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    n = sum(len(pdf) for pdf in pdfs)
    (total,) = state.get if state.exists else (0,)
    total += n
    state.update((total,))
    yield pd.DataFrame(
        {"user_id": [key[0]], "batch_events": [n], "total_events": [total]}
    )


def running_event_counter(
    stream: DataFrame, key_cols: Sequence[str] = ("user_id",)
) -> DataFrame:
    """Per-key lifetime event counter: each micro-batch emits the batch
    delta and the running total carried in keyed state."""
    return stream.groupBy(*key_cols).applyInPandasWithState(
        _counter_fn,
        outputStructType=COUNTER_OUTPUT_SCHEMA,
        stateStructType=COUNTER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
