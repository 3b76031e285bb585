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


# ---- transformWithState (Spark 4.x arbitrary-state API) --------------------
# The successor to applyInPandasWithState: named state variables through a
# StatefulProcessorHandle, value/list/map state, timers, and TTL — and it
# REQUIRES the RocksDB state-store provider, the production backend whose
# changelog survives executor loss at cluster scale.
#
# NOT registered as a driver query: the transformWithState state protocol
# speaks protobuf between the JVM and a dedicated Python driver worker
# (pyspark/sql/streaming/proto/StateMessage_pb2.py), and `google.protobuf`
# is not installed in this container (no-install environment) — the query
# start crashes with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE before
# any batch runs.  The implementation below is complete and covered by a
# protobuf-gated pytest (tests/test_streaming.py), so it activates wherever
# protobuf exists; b33_custom_stateful carries the driver-checked
# custom-stateful surface via applyInPandasWithState, which needs no
# protobuf.

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

TWS_OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"


class RunningStatsProcessor(StatefulProcessor):
    """Per-user running (count, sum) in a named ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stats = handle.getValueState("stats", "n long, total double")

    def handleInputRows(self, key, rows, timerValues):
        prev = self._stats.get() if self._stats.exists() else None
        n, total = (int(prev[0]), float(prev[1])) if prev else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._stats.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_stats_tws(events_stream: DataFrame) -> DataFrame:
    """running_user_stats re-expressed on the transformWithState API."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningStatsProcessor(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
