"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY.md §2.9/§2.10 — the engine's
user-extensible stateful surface; the reference has no streaming
operators, its stateful behavior is the done-signal protocol,
luigi-pipeline/luigi_commons.py:38-109).

Why a custom operator when ``session_window`` exists: the built-in can
only aggregate; a stateful UDF can carry arbitrary per-key state across
micro-batches (open-session carry-over, per-session payloads, custom
close policies). This module keeps the semantics identical to the
built-in gap session window so the result stays oracle-checkable with
gaps-and-islands SQL.

Scale posture: state is one open session per user key (three scalars),
partitioned by the groupBy key — the shuffle carries events once and
state lives in the state store, not the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUT_SCHEMA = "user_id long, session_start timestamp, n_events long"
STATE_SCHEMA = "session_start long, last_ts long, n long"  # micros since epoch


def sessionize_with_state(events: DataFrame, *, gap_minutes: int = 30,
                          key_col: str = "user_id") -> DataFrame:
    """Sessionize a (streaming) events frame: sessions close when the
    event-time gap is >= ``gap_minutes``; emits one row per closed
    session plus, at each batch boundary, the still-open session (so a
    single availableNow batch yields exactly the batch sessionization).

    The open session is kept in the group state between micro-batches;
    rows inside one invocation are sorted by (ts, event_id) so results
    are partition-order-invariant.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60_000_000

    def fn(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = rows["ts"].astype("int64") // 1000  # ns -> us
        if state.exists:
            sess_start, last_ts, n = state.get
        else:
            sess_start = last_ts = None
            n = 0
        out_start: list[int] = []
        out_n: list[int] = []
        for t in ts_us:
            if last_ts is not None and t - last_ts >= gap_us:
                out_start.append(sess_start)
                out_n.append(n)
                sess_start, n = t, 0
            if sess_start is None:
                sess_start = t
            last_ts = t
            n += 1
        state.update((sess_start, last_ts, n))
        # emit the open session too: for an availableNow single-batch
        # run this completes the batch-sessionization contract
        out_start.append(sess_start)
        out_n.append(n)
        yield pd.DataFrame({
            "user_id": key[0],
            "session_start": pd.to_datetime(pd.Series(out_start), unit="us"),
            "n_events": pd.Series(out_n, dtype="int64"),
        })

    return (events.groupBy(key_col)
            .applyInPandasWithState(fn, OUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))


def running_count_tws(events: DataFrame, *, key_col: str = "user_id"
                      ) -> DataFrame:
    """Per-key running event count via ``transformWithStateInPandas`` —
    Spark 4's next-generation arbitrary-state API (typed state
    variables on a StatefulProcessorHandle instead of one opaque
    GroupState tuple; RocksDB-backed, so state scales past executor
    heap). Functionally the streaming twin of ``groupBy(key).count()``:
    after each micro-batch the emitted row carries the key's total so
    far, so one availableNow batch reproduces the batch aggregate
    exactly (the oracle-checkable contract).

    Kept deliberately minimal — the point is the API surface: value
    state declared in ``init``, per-batch Arrow row iteration in
    ``handleInputRows``, update-mode emission.

    GATED: transformWithState's Python worker serializes state over
    protobuf; environments without a working ``google.protobuf`` (this
    sandbox — import-checked below) get a clear error here instead of
    an opaque mid-query worker crash. The operator is therefore
    test-skipped rather than registry-gated; ``sessionize_with_state``
    (applyInPandasWithState, no protobuf dependency) is the registered
    stateful surface.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas needs a working google.protobuf "
            "in the Python workers; not available in this environment"
        ) from e
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n long")

        def handleInputRows(self, key, rows, timerValues):
            batch_n = sum(len(pdf) for pdf in rows)
            prev = self._n.get() if self._n.exists() else None
            total = (prev[0] if prev else 0) + batch_n
            self._n.update((total,))
            yield pd.DataFrame({"user_id": [key[0]],
                                "n_events": [total]})

        def close(self) -> None:
            pass

    spark = events.sparkSession
    # transformWithState requires the RocksDB state store provider
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    return (events.groupBy(key_col)
            .transformWithStateInPandas(
                statefulProcessor=RunningCount(),
                outputStructType="user_id long, n_events long",
                outputMode="Update",
                timeMode="None"))
