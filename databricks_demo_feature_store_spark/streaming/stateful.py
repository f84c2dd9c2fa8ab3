"""Custom stateful streaming operator via ``applyInPandasWithState``.

``session_window``/window aggs cover the built-in stateful shapes; this is
the escape hatch for operator state Spark doesn't provide natively. The
demo operator maintains per-user running stats — event count, first event
id, last event time — as explicit group state across micro-batches.

Determinism contract: every state component is order-independent
(count/min/max are commutative+associative), so the FINAL state is
identical for any micro-batch partitioning of the input; emissions are
cumulative snapshots, and the latest emission per key (the one with the
max count) IS the batch answer. That makes the operator verifiable
against a plain GROUP BY oracle even though it runs through the real
streaming state store.

Scale notes: state is shuffled by the grouping key into the state store
(RocksDB in production), so state size is O(distinct keys), not O(rows);
the pandas function receives Arrow batches per key group — no per-row
Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_SCHEMA = "user_id bigint, n_events bigint, first_event_id bigint, last_ts_us bigint"
_STATE_SCHEMA = "count bigint, min_id bigint, max_ts_us bigint"


def stateful_user_stats(stream: DataFrame) -> DataFrame:
    """Running per-user stats as explicit group state (update mode).

    The update function is a nested closure (not a module-level function)
    so cloudpickle serializes it BY VALUE: executor Python workers don't
    need this package on their import path — the driver may import this
    repo from an arbitrary cwd without shipping it via addPyFile. It must
    reference only closure vars, builtins, and worker-importable modules
    (pandas).
    """

    def update_user_stats(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        count, min_id, max_ts = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            count += len(pdf)
            batch_min = int(pdf["event_id"].min())
            batch_max = int(pdf["ts_us"].max())
            min_id = batch_min if min_id is None else min(min_id, batch_min)
            max_ts = batch_max if max_ts is None else max(max_ts, batch_max)
        state.update((count, min_id, max_ts))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [count],
                "first_event_id": [min_id],
                "last_ts_us": [max_ts],
            }
        )

    events = stream.select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    return events.groupBy("user_id").applyInPandasWithState(
        update_user_stats,
        outputStructType=STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_user_stats(emissions: DataFrame) -> DataFrame:
    """Collapse cumulative emissions to each key's final state.

    Counts increase monotonically per key, and min/max move monotonically,
    so max/min across emissions equals the last (final) snapshot."""
    return emissions.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.min("first_event_id").alias("first_event_id"),
        F.timestamp_micros(F.max("last_ts_us")).alias("last_ts"),
    )


def stateful_user_stats_tws(stream: DataFrame) -> DataFrame:
    """The same per-user running stats through Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState``: explicit named state handles
    (ValueState/ListState/MapState), per-state TTL, and timers, instead
    of one opaque state tuple. Kept alongside the legacy twin so both
    stateful surfaces stay covered; the emission contract (cumulative
    snapshots, order-independent components) is identical, so the same
    GROUP BY oracle verifies it.

    The processor class is defined inside this function so cloudpickle
    ships it BY VALUE — executor Python workers never import this
    package.

    Environment note: the TWS runtime speaks protobuf to the state
    server; on images without ``protobuf`` the query fails at
    initialization (this sandbox — the legacy twin above carries the
    driver gate there). The implementation is complete and the test
    suite exercises it wherever protobuf is importable.
    """
    try:  # TWS hard-requires protobuf at run time; fail early and clearly
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package "
            "(pyspark's TWS state protocol); install protobuf or use "
            "stateful_user_stats (applyInPandasWithState) instead"
        ) from e
    try:  # Spark 4.0+ API; 3.5 sessions use the applyInPandasWithState twin
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "transformWithStateInPandas requires PySpark >= 4.0; on 3.5 use "
            "stateful_user_stats (applyInPandasWithState), which has the "
            "same emission contract"
        ) from e

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState("stats", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            count, min_id, max_ts = 0, None, None
            if self._stats.exists():
                count, min_id, max_ts = self._stats.get()
            for pdf in rows:
                count += len(pdf)
                batch_min = int(pdf["event_id"].min())
                batch_max = int(pdf["ts_us"].max())
                min_id = batch_min if min_id is None else min(min_id, batch_min)
                max_ts = batch_max if max_ts is None else max(max_ts, batch_max)
            self._stats.update((count, min_id, max_ts))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [count],
                    "first_event_id": [min_id],
                    "last_ts_us": [max_ts],
                }
            )

        def close(self) -> None:
            pass

    events = stream.select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStats(),
        outputStructType=STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
