"""Gap-based sessionization on ``transformWithStateInPandas`` —
Spark 4's arbitrary-stateful API (the successor to
``applyInPandasWithState``, SPARK-46815 "State API v2").

Why both exist here: ``stateful.py`` is the classic GroupState form;
this is the same operator on the new API, which brings composable
typed state handles (ValueState/ListState/MapState), timers, and
state-store TTL — and requires the RocksDB state store provider,
which is also the right provider at scale (state spills to disk
instead of executor heap, changelog checkpointing keeps commits
incremental). Both sessionizers share gap semantics and are pinned
equal by tests/test_streaming_tws.py.

State per user is one fixed-width row (n, total, start_us, end_us):
bounded by |active users| exactly like the v1 operator.

Environment note: executing a TWS query requires ``google.protobuf``
(the API's state-server wire format), which this container lacks —
so the equivalence test (tests/test_streaming_tws.py) runs the full
v1==v2 comparison only where protobuf is importable and otherwise
pins the operator down to the physical plan node. Same gating
pattern as the Kafka connector (no broker) and media codecs
(no Pillow/ffmpeg).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from .stateful import SESSION_GAP_MS, SESSION_OUTPUT_SCHEMA, STATE_SCHEMA

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class SessionProcessor(StatefulProcessor):
    """Folds each user's events into an open-session ValueState and
    emits a session row whenever the 30-min gap closes one."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._sess = handle.getValueState("sess", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(rows)).sort_values("ts")
        ts_us = pdf["ts"].astype("int64") // 1000
        vals = pdf["value"].fillna(0.0)

        if self._sess.exists():
            n, total, start_us, end_us = self._sess.get()
        else:
            n, total, start_us, end_us = 0, 0.0, None, None

        out: list[dict] = []
        for t, v in zip(ts_us.tolist(), vals.tolist()):
            if end_us is not None and (t - end_us) > SESSION_GAP_MS * 1000:
                out.append(
                    {
                        "user_id": user_id,
                        "session_events": n,
                        "session_value": total,
                        "session_start": pd.Timestamp(start_us, unit="us"),
                        "session_end": pd.Timestamp(end_us, unit="us"),
                        "closed_by": "gap",
                    }
                )
                n, total, start_us = 0, 0.0, None
            n += 1
            total += v
            start_us = t if start_us is None else start_us
            end_us = t
        self._sess.update((n, total, start_us, end_us))
        if out:
            yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def sessionize_events_tws(events: DataFrame) -> DataFrame:
    """events stream -> closed sessions per user (gap > 30 min), on
    the State API v2. Caller must run with the RocksDB state store
    provider (``ROCKSDB_PROVIDER``) — required by the API and the
    scale-correct provider anyway."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionProcessor(),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
