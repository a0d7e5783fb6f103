"""Native session windows (F.session_window): the built-in
gap-session operator, pinned equal to the lag-based batch
sessionization (q23) and exercised end-to-end as a stream.

Gap semantics: q23 starts a new session when diff > 1800 s measured
on unix_timestamp (second-truncated); session_window also splits on
diff > gap (events merge while next_ts <= prev_ts + gap), so
second-truncated timestamps with the same 1800 s gap are the exact
equivalent."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from big_data_spark.queries import QUERIES
from big_data_spark.streaming import read_events_stream

from .conftest import SF_ORACLE, SF_SMOKE

GAP = "1800 seconds"


def _native_sessions(ev):
    trunc = ev.withColumn("ts", F.date_trunc("second", "ts"))
    return trunc.groupBy("user_id", F.session_window("ts", GAP)).agg(
        F.count("*").alias("n_events")
    )


def test_session_window_matches_lag_sessionization(spark):
    """Per-user session counts and event-count multisets from the
    native operator must equal q23's lag + running-sum form."""
    from big_data_spark.catalog import load_table

    ev = load_table(spark, SF_ORACLE, "events").filter(F.col("user_id") < 200)
    native = _native_sessions(ev)
    q23 = QUERIES["q23_event_sessions"].fn(spark, SF_ORACLE)

    n_native = {
        r["user_id"]: r["n"]
        for r in native.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    n_q23 = {
        r["user_id"]: r["n"]
        for r in q23.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert n_native == n_q23

    sizes_native = sorted(
        (r["user_id"], r["n_events"]) for r in native.collect()
    )
    sizes_q23 = sorted((r["user_id"], r["n_events"]) for r in q23.collect())
    assert sizes_native == sizes_q23


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """The same session_window aggregation mounted on readStream
    (watermarked, availableNow) must converge to the batch answer —
    bounded state: sessions close once the watermark passes the gap."""
    src = tmp_path / "events"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "events.parquet")

    from big_data_spark.catalog import load_table

    batch_ev = load_table(spark, str(src), "events").filter(
        F.col("user_id") < 50
    )
    expected = sorted(
        (r["user_id"], r["session_window"]["start"], r["n_events"])
        for r in _native_sessions(batch_ev).collect()
    )

    stream_ev = (
        read_events_stream(spark, str(src))
        .filter(F.col("user_id") < 50)
        .withColumn("ts", F.date_trunc("second", "ts"))
    )
    q = (
        stream_ev.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", GAP))
        .agg(F.count("*").alias("n_events"))
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["session_window"]["start"], r["n_events"])
        for r in spark.read.parquet(str(tmp_path / "sink")).collect()
    )
    # availableNow + watermark: sessions still open at stream end are
    # withheld as state; everything emitted must match batch exactly,
    # and coverage must be near-complete.
    assert got, "stream emitted nothing"
    want = set(expected)
    for row in got:
        assert row in want, row
    assert len(got) >= len(expected) - 60
