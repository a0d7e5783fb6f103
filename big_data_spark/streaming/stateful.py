"""Custom stateful streaming operator: gap-based sessionization.

The reference has no stateful streaming at all (SURVEY §2.9); this is
the north-star custom-operator slot — ``applyInPandasWithState`` with
Arrow-batched state, the recommended Spark shape for semantics the
built-in windowed aggregations can't express.

State per user is O(1) (running aggregates only), so total state is
bounded by |active users|; the timeout closes idle sessions and frees
state, which is what keeps an unbounded 100-TB/day stream from
accreting unbounded state.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_events", IntegerType()),
        StructField("session_value", DoubleType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("closed_by", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", IntegerType()),
        StructField("total", DoubleType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
    ]
)

SESSION_GAP_MS = 30 * 60 * 1000


def _sessionize(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold a user's micro-batch rows into session state.

    Emits a row when the gap between consecutive events exceeds
    SESSION_GAP_MS (session closed by data) or on state timeout
    (session closed by clock).
    """
    (user_id,) = key
    if state.hasTimedOut:
        n, total, start_us, end_us = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_events": [n],
                "session_value": [total],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "closed_by": ["timeout"],
            }
        )
        return

    rows = pd.concat(list(pdfs)).sort_values("ts")
    ts_us = rows["ts"].astype("int64") // 1000
    vals = rows["value"].fillna(0.0)

    if state.exists:
        n, total, start_us, end_us = state.get
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
    state.update((n, total, start_us, end_us))
    state.setTimeoutDuration(SESSION_GAP_MS)
    if out:
        yield pd.DataFrame(out)


def sessionize_events(events: DataFrame) -> DataFrame:
    """events stream -> closed sessions per user (gap > 30 min)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
