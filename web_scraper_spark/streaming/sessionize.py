"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md input-hint: custom stateful
operators go through the Arrow-batched state API, never per-row Python).

Semantics match the batch form (plans/contract_training.stream_sessionize):
a session breaks when >gap_s elapses between a user's consecutive events.
The streaming version holds (last_ts, session_count, event_count) per
user in GroupState and emits one row per user per micro-batch; the batch
query is the oracle in tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_ts double, n_sessions long, n_events long"

GAP_S = 1800.0


def _sessionize_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last_ts, n_sessions, n_events = state.get
    else:
        last_ts, n_sessions, n_events = None, 0, 0
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        ts = pdf["ts"].astype("int64").to_numpy() / 1e9  # epoch seconds
        for t in ts:  # per-event state walk within the Arrow batch
            if last_ts is None or (t - last_ts) > GAP_S:
                n_sessions += 1
            last_ts = t
        n_events += len(pdf)
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events stream -> per-user running (n_sessions, n_events)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
