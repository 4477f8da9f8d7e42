"""Custom stateful streaming operator: live per-conversation state.

The reference has no stateful stream processing at all (SURVEY.md §2.9); this
is the engine-native pattern for maintaining low-latency per-key state beside
the exactly-once lake table: ``applyInPandasWithState`` keyed by ``conv_id``,
Arrow-batched (no per-row Python), state-store-backed and checkpointable.

Emits one row per conversation per micro-batch it appears in:
``(conv_id, events_seen, distinct_turns, last_ts)`` — the streaming analogue
of the reference's per-subject aggregate features (A2-A4) kept incrementally
instead of recomputed batch-wide.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, events_seen long, distinct_turns long, last_ts_us long"
)
STATE_SCHEMA = "events_seen long, turns array<int>, last_ts_us long"


def _update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
    events, turns, last_us = 0, [], 0
    if state.exists:
        events, turns, last_us = state.get
        turns = list(turns)
    seen = set(turns)
    for pdf in pdfs:
        events += len(pdf)
        seen.update(int(t) for t in pdf["turn_idx"])
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((events, sorted(seen), last_us))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "events_seen": [events],
            "distinct_turns": [len(seen)],
            "last_ts_us": [last_us],
        }
    )


def conversation_state(stream_df: DataFrame) -> DataFrame:
    """Stateful per-conversation rollup over the change stream.

    Input needs ``conv_id``, ``turn_idx``, ``ts``. Works on batch DataFrames
    too? No — ``applyInPandasWithState`` is streaming-only by design; the
    batch equivalent is a plain groupBy (tests compare the two).
    """
    src = stream_df.select(
        "conv_id", "turn_idx", F.col("ts").cast("timestamp").alias("ts")
    )
    return src.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
