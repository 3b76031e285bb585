"""Custom stateful streaming operators via applyInPandasWithState.

`running_user_stats` keeps one state row per user_id across microbatches —
the "custom stateful operator" shape (reference has no streaming at all; this
is part of the declared analytics surface, SURVEY.md §2B-33).

State is bounded: one (count, sum, max_ts) triple per user; with a GroupState
timeout it would age out idle users — wired here with ProcessingTimeTimeout
disabled for deterministic tests.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, batches long"
STATE_SCHEMA = "n long, total double, batches long"


def _update_user(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, batches = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    batches += 1
    state.update((n, total, batches))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "batches": [batches],
        }
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained in explicit group state."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
