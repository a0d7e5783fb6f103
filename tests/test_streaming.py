"""Streaming ETL + windowed agg + stateful sessionization (T1-T4 and
the SURVEY §2.9 idiomatic extensions), driven through real
StreamingQuery runs on file sources (availableNow triggers).
"""

from __future__ import annotations

import json
import shutil

import pytest

from big_data_spark.fixtures import JOBS_COLUMNS, JOBS_CORPUS
from big_data_spark.operators.job_etl import clean_job_postings
from big_data_spark.streaming import (
    read_events_stream,
    stream_clean_postings,
    windowed_event_counts,
)
from big_data_spark.streaming.stateful import sessionize_events

from .conftest import SF_SMOKE


@pytest.fixture()
def jobs_json_dir(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # two files -> at least one micro-batch each under maxFilesPerTrigger
    for part in range(2):
        with open(src / f"part-{part}.json", "w") as f:
            for i, row in enumerate(JOBS_CORPUS):
                if i % 2 != part:
                    continue
                rec = dict(zip(JOBS_COLUMNS, row))
                rec["event_time"] = "2024-01-01 10:00:00"
                rec["event_type"] = "JOB_CREATED"
                f.write(json.dumps(rec) + "\n")
    return str(src)


def test_stream_etl_matches_batch(spark, tmp_path, jobs_json_dir):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = stream_clean_postings(spark, jobs_json_dir, sink, ckpt)
    q.awaitTermination(120)

    from big_data_spark.schemas import JOB_POSTING_RAW_SCHEMA

    out = spark.read.parquet(sink)
    raw = spark.read.schema(JOB_POSTING_RAW_SCHEMA).json(jobs_json_dir)
    batch = clean_job_postings(raw, deterministic_id=True)

    assert sorted(out.columns) == sorted(batch.columns)
    skip = {"id"}  # id hashes all input cols incl. file-order-dependent ones
    cols = sorted(set(out.columns) - skip)
    srows = sorted(map(tuple, out.select(cols).collect()), key=repr)
    brows = sorted(map(tuple, batch.select(cols).collect()), key=repr)
    assert srows == brows
    # null-title row dropped, everything else kept
    assert out.count() == len(JOBS_CORPUS) - 1


def test_stream_etl_checkpoint_exactly_once(spark, tmp_path, jobs_json_dir):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = stream_clean_postings(spark, jobs_json_dir, sink, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(sink).count()
    # restart on the same checkpoint: no new input -> no duplicate rows
    q2 = stream_clean_postings(spark, jobs_json_dir, sink, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == n1


def test_windowed_counts_match_batch(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "events.parquet")

    stream = read_events_stream(spark, str(src))
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        windowed_event_counts(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["cnt"], round(r["total_value"], 6))
        for r in spark.read.parquet(sink).collect()
    }
    from big_data_spark.catalog import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_SMOKE, "events")
    want = {
        (r["ws"], r["event_type"]): (r["cnt"], round(r["tv"], 6))
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("tv"))
        .select(F.col("w.start").alias("ws"), "event_type", "cnt", "tv")
        .collect()
    }
    # availableNow + watermark: the final (max-ts) windows may be
    # withheld as "open" state at stream end; everything emitted must
    # match batch, and coverage must be near-complete.
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert want[k] == v, k
    assert len(got) >= len(want) - 10


def test_sessionize_events(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "events.parquet")
    stream = read_events_stream(spark, str(src))
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        sessionize_events(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.read.parquet(sink)
    rows = out.collect()
    assert rows, "no sessions closed"
    for r in rows:
        assert r["session_events"] >= 1
        assert r["session_end"] >= r["session_start"]
        assert r["closed_by"] in ("gap", "timeout")


def test_stream_static_join(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "events.parquet")
    from big_data_spark.streaming import enriched_event_stream

    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 5.0)],
        ["event_type", "weight"],
    )
    stream = read_events_stream(spark, str(src))
    enriched = enriched_event_stream(stream, dim)
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        enriched.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.count() == spark.read.parquet(str(src / "events.parquet")).count()
    got = {r["event_type"]: r["weight"] for r in out.select("event_type", "weight").distinct().collect()}
    assert got["click"] == 1.0 and got["purchase"] == 5.0
    assert got["error"] is None  # left join keeps unmatched stream rows


def test_foreach_batch_upsert_idempotent(spark, tmp_path, jobs_json_dir):
    from big_data_spark.schemas import JOB_POSTING_RAW_SCHEMA
    from big_data_spark.streaming.sinks import start_upsert_stream

    stream = (
        spark.readStream.schema(JOB_POSTING_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(jobs_json_dir)
    )
    sink = str(tmp_path / "sink")
    q = start_upsert_stream(stream, sink, str(tmp_path / "c1"), key="job_title")
    q.awaitTermination(120)
    n1 = spark.read.parquet(sink).count()
    # null key counts as one distinct key in the sink too
    distinct_titles = (
        spark.read.schema(JOB_POSTING_RAW_SCHEMA)
        .json(jobs_json_dir)
        .select("job_title")
        .distinct()
        .count()
    )
    # one row per key even though keys repeat across micro-batches
    assert n1 == distinct_titles
    # replay the same source on a FRESH checkpoint: still no dupes
    q2 = start_upsert_stream(stream, sink, str(tmp_path / "c2"), key="job_title")
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == n1


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics, as Spark actually guarantees them: a late
    row arriving AFTER its window's state was evicted (watermark
    passed the window end and the append-mode result was emitted) is
    dropped — the finalized window is emitted exactly once and never
    reopened. (A late row whose window state still exists is merged;
    eviction happens at end-of-batch.)"""
    import datetime
    import glob as _glob
    import time as _time

    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    src_dir = tmp_path / "src"
    src_dir.mkdir()

    def row(i, hour, minute):
        return (i, datetime.datetime(2024, 1, 1, hour, minute), 1, "click", 1.0, "{}")

    def write_one(rows, name):
        tmp = tmp_path / f"_stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp))
        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.copy(part, src_dir / f"{name}.parquet")

    # f1 seeds the 00:00 window and pushes event time to 10:00;
    # f2 advances the watermark past 01:00 -> 00:00 window emitted
    # and evicted; f3 is a late replay into the evicted window;
    # f4 advances time again so any (wrong) reopened state would emit.
    write_one([row(1, 0, 10), row(2, 0, 20), row(3, 10, 0)], "f1")
    _time.sleep(1.1)
    write_one([row(4, 12, 0)], "f2")
    _time.sleep(1.1)
    write_one([row(5, 0, 40)], "f3")
    _time.sleep(1.1)
    write_one([row(6, 14, 0)], "f4")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("ws"), "cnt")
    )
    sink = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    rows = spark.read.parquet(sink).collect()
    h0 = datetime.datetime(2024, 1, 1, 0, 0)
    emitted_h0 = [r for r in rows if r["ws"] == h0]
    assert len(emitted_h0) == 1, rows  # finalized window emitted exactly once
    assert emitted_h0[0]["cnt"] == 2, rows  # late replay not merged
    assert dropped >= 1  # the engine reported the watermark drop


@pytest.mark.parametrize("seed", [7, 21, 42])
def test_watermark_lateness_property_fuzz(spark, tmp_path, seed):
    """Property fuzz of windowed_event_counts' late-data semantics:
    random out-of-order event times streamed one file per micro-batch
    must respect a Python model of Spark's ONE-SIDED watermark
    contract (rows less than `delay` late are never dropped; older
    rows MAY be dropped, and the engine may apply the watermark with
    a batch of lag) —
    (1) every emitted (window, event_type) appears exactly once,
    (2) its count/sum lie between the model's minimum-kept rows
        (prompt-drop model) and all arrivals for that window,
    (3) emitted windows ⊇ those finalized ≥2 batches before stream
        end and ⊆ those finalized by the final watermark
        (availableNow may withhold end-of-stream finalizations)."""
    import datetime
    import glob as _glob
    import random
    import time as _time

    from collections import defaultdict

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    rng = random.Random(seed)
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    base = datetime.datetime(2024, 1, 1)
    n_batches, per_batch = 4, 25
    batches = []
    eid = 0
    for k in range(n_batches):
        rows = []
        for _ in range(per_batch):
            # out-of-order: any hour 0..11, but drift forward so the
            # watermark actually advances between batches
            hour = rng.randint(0, 5) + 2 * k
            ts = base + datetime.timedelta(
                hours=hour, minutes=rng.randint(0, 59)
            )
            rows.append(
                (eid, ts, rng.randint(1, 3), rng.choice(["click", "view"]), 1.0, "{}")
            )
            eid += 1
        batches.append(rows)

    # --- Python model of the watermark contract (delay=2h, window=1h)
    delay = datetime.timedelta(hours=2)
    one_h = datetime.timedelta(hours=1)

    def wstart(ts):
        return ts.replace(minute=0, second=0, microsecond=0)

    wm = None  # watermark before the current batch (-inf initially)
    min_cnt: dict = defaultdict(int)  # prompt-drop model: minimum kept
    min_val: dict = defaultdict(float)
    all_cnt: dict = defaultdict(int)  # every arrival: maximum kept
    all_val: dict = defaultdict(float)
    wm_after = []  # watermark value after each batch
    for rows in batches:
        for _, ts, _, et, val, _ in rows:
            k = (wstart(ts), et)
            all_cnt[k] += 1
            all_val[k] += val
            wend = wstart(ts) + one_h
            if wm is not None and wend <= wm:
                continue  # MAY be dropped (more than `delay` late)
            min_cnt[k] += 1  # less than `delay` late: never dropped
            min_val[k] += val
        batch_wm = max(r[1] for r in rows) - delay
        wm = batch_wm if wm is None else max(wm, batch_wm)
        wm_after.append(wm)

    # two batches of slack on the lower bound: the engine may apply
    # watermark updates with a batch of lag
    surely_emitted = {
        k for k in min_cnt if k[0] + one_h <= wm_after[-3]
    }
    may_emit = {k for k in all_cnt if k[0] + one_h <= wm_after[-1]}

    # --- stream the same batches, one file per trigger, in order
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    for k, rows in enumerate(batches):
        tmp = tmp_path / f"_stage_{k}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp))
        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.copy(part, src_dir / f"f{k}.parquet")
        if k < n_batches - 1:
            _time.sleep(1.1)  # file-source ordering is by mtime

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    sink = str(tmp_path / "out")
    q = (
        windowed_event_counts(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emitted = spark.read.parquet(sink).collect()
    got = {}
    for r in emitted:
        k = (r["window_start"], r["event_type"])
        assert k not in got, f"window emitted twice: {k}"  # (1) exactly once
        got[k] = (r["cnt"], r["total_value"])

    for k, (cnt, tv) in got.items():  # (2) one-sided count bounds
        assert min_cnt[k] <= cnt <= all_cnt[k], (k, cnt, min_cnt[k], all_cnt[k])
        assert min_val[k] - 1e-6 <= tv <= all_val[k] + 1e-6, (k, tv)
    gk = set(got)
    assert surely_emitted <= gk, surely_emitted - gk  # (3) lower bound
    assert gk <= may_emit, gk - may_emit  # (3) upper bound


def test_upsert_probe_prunes_to_touched_buckets(spark, tmp_path, jobs_json_dir):
    """The existing-keys probe must read only the key buckets the
    batch touches — a partition filter on _kb, not a full sink scan
    (the unbucketed design re-scanned every key ever landed)."""
    from big_data_spark.plans import formatted_plan
    from big_data_spark.schemas import JOB_POSTING_RAW_SCHEMA
    from big_data_spark.streaming.sinks import (
        pruned_existing_keys,
        start_upsert_stream,
        touched_key_buckets,
    )

    stream = (
        spark.readStream.schema(JOB_POSTING_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(jobs_json_dir)
    )
    sink = str(tmp_path / "sink")
    q = start_upsert_stream(stream, sink, str(tmp_path / "c1"), key="job_title")
    q.awaitTermination(120)

    batch = spark.read.schema(JOB_POSTING_RAW_SCHEMA).json(jobs_json_dir).limit(2)
    buckets = touched_key_buckets(batch, "job_title", 64)
    assert 0 < len(buckets) <= 2
    probe = pruned_existing_keys(spark, sink, "job_title", buckets)
    plan = formatted_plan(probe)
    # _kb is a partition column and the isin filter lands as a
    # partition filter -> untouched bucket dirs are never opened
    assert "PartitionFilters" in plan and "_kb" in plan.split("PartitionFilters", 1)[1]
    # probe returns only keys from the touched buckets
    all_kb = spark.read.parquet(sink).select("_kb").distinct().count()
    assert all_kb > len(buckets)  # sink spans more buckets than the probe reads


def test_kafka_source_config_swap(spark):
    """S1: the Kafka source is a config swap on the same pipeline.
    With a broker (KAFKA_BOOTSTRAP set) this builds and starts the
    real source; without one, the builder must fail at the connector
    boundary — i.e. the swap path is syntactically exercised all the
    way to format('kafka').load()."""
    import os

    from big_data_spark.streaming import read_postings_kafka

    bootstrap = os.environ.get("KAFKA_BOOTSTRAP")
    if bootstrap:
        df = read_postings_kafka(spark, bootstrap, "job_postings")
        assert df.isStreaming and "job_title" in df.columns
    else:
        with pytest.raises(Exception, match="(?i)kafka"):
            read_postings_kafka(spark, "localhost:9092", "job_postings")


def test_kafka_parse_schema_parity(spark):
    """S1/S2 builder-level parity without a broker: the Kafka parse
    chain (value bytes -> from_json -> unwrap), run over a DataFrame
    shaped like Kafka's wire schema, must yield EXACTLY the file
    stand-in's schema and round-trip a sample record's values."""
    import json

    from pyspark.sql import types as T

    from big_data_spark.fixtures import JOBS_COLUMNS, JOBS_CORPUS
    from big_data_spark.schemas import JOB_POSTING_RAW_SCHEMA
    from big_data_spark.streaming import parse_kafka_postings

    rec = dict(zip(JOBS_COLUMNS, JOBS_CORPUS[0]))
    wire_schema = T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("timestamp", T.TimestampType()),
            T.StructField("timestampType", T.IntegerType()),
        ]
    )
    wire = spark.createDataFrame(
        [(None, json.dumps(rec).encode(), "job_postings", 0, 0, None, 0)],
        wire_schema,
    )
    parsed = parse_kafka_postings(wire)
    assert parsed.schema == JOB_POSTING_RAW_SCHEMA
    # and equals the file stand-in's declared schema (they are the
    # same constant today; this pins the parity if either drifts)
    row = parsed.first()
    for col in ("job_title", "city", "skills"):
        assert row[col] == rec[col]


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream inner join with watermarks + event-time bound:
    the streamed result must equal the identical batch join (same
    interval condition) once both sources drain under availableNow."""
    import pyspark.sql.functions as F

    from big_data_spark.streaming import join_event_streams, read_events_stream

    left_dir, right_dir = tmp_path / "left", tmp_path / "right"
    left_dir.mkdir()
    right_dir.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", left_dir / "events.parquet")
    shutil.copy(f"{SF_SMOKE}/events.parquet", right_dir / "events.parquet")

    clicks = read_events_stream(spark, str(left_dir)).filter(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, str(right_dir)).filter(
        F.col("event_type") == "purchase"
    )
    joined = join_event_streams(clicks, purchases, max_delay="1 hour")
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        joined.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(sink).count()

    from big_data_spark.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    c = ev.filter(F.col("event_type") == "click").alias("l")
    p = ev.filter(F.col("event_type") == "purchase").alias("r")
    want = c.join(
        p,
        F.expr(
            "l.user_id = r.user_id AND r.ts BETWEEN l.ts AND l.ts + INTERVAL 1 hour"
        ),
    ).count()
    assert got == want and got > 0


def test_stream_stream_left_outer_join_emits_unmatched(spark, tmp_path):
    """Watermarked LEFT OUTER stream-stream join: rows with a match
    join as usual; rows the watermark proves unmatched emit
    null-padded. Every emitted row must match the batch left-outer
    join, matched rows must all arrive, and a nonzero number of
    null-padded rows must appear (the outer semantics actually
    firing)."""
    import pyspark.sql.functions as F

    from big_data_spark.streaming import join_event_streams, read_events_stream

    left_dir, right_dir = tmp_path / "left", tmp_path / "right"
    left_dir.mkdir()
    right_dir.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", left_dir / "events.parquet")
    shutil.copy(f"{SF_SMOKE}/events.parquet", right_dir / "events.parquet")

    clicks = read_events_stream(spark, str(left_dir)).filter(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, str(right_dir)).filter(
        F.col("event_type") == "purchase"
    )
    joined = join_event_streams(
        clicks, purchases, max_delay="1 hour", how="left_outer"
    )
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        joined.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(sink)

    from big_data_spark.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    c = ev.filter(F.col("event_type") == "click").alias("l")
    p = ev.filter(F.col("event_type") == "purchase").alias("r")
    want = c.join(
        p,
        F.expr(
            "l.user_id = r.user_id AND r.ts BETWEEN l.ts AND l.ts + INTERVAL 1 hour"
        ),
        "left_outer",
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
    )
    key = lambda r: (r["user_id"], r["left_ts"], r["right_ts"])  # noqa: E731
    got_rows = {key(r) for r in got.select("user_id", "left_ts", "right_ts").collect()}
    want_rows = {key(r) for r in want.collect()}
    assert got_rows <= want_rows
    # all MATCHED rows emit (inner part is watermark-independent here)
    matched = {k for k in want_rows if k[2] is not None}
    assert matched <= got_rows
    # and the outer semantics fired: null-padded rows were emitted
    nulls_emitted = {k for k in got_rows if k[2] is None}
    assert nulls_emitted, "no unmatched rows emitted"


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate keys arriving across micro-batches inside the
    watermark horizon land exactly once; state is evictable (the
    within-watermark variant), unlike unbounded dropDuplicates."""
    import pyspark.sql.functions as F

    from big_data_spark.streaming import dedup_stream_within_watermark

    src = tmp_path / "src"
    src.mkdir()
    # two files -> two micro-batches (maxFilesPerTrigger=1), with
    # overlapping fingerprints across them
    rows1 = [(i, f"doc-{i % 4}", "2024-01-01 10:0%d:00" % (i % 6)) for i in range(8)]
    rows2 = [(i + 8, f"doc-{i % 4}", "2024-01-01 10:1%d:00" % (i % 6)) for i in range(8)]
    for name, rows in (("a", rows1), ("b", rows2)):
        spark.createDataFrame(rows, "event_id long, fingerprint string, ts_s string") \
            .coalesce(1).write.mode("overwrite").json(str(src / name))
    stream = (
        spark.readStream.schema("event_id long, fingerprint string, ts_s string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
    )
    deduped = dedup_stream_within_watermark(stream, ["fingerprint"], watermark="2 hours")
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    fps = [r["fingerprint"] for r in out.select("fingerprint").collect()]
    assert sorted(set(fps)) == ["doc-0", "doc-1", "doc-2", "doc-3"]
    assert len(fps) == 4  # each fingerprint exactly once across batches


def test_upsert_probe_falls_back_without_kb_column(spark, tmp_path):
    """A legacy/external sink without the _kb partition column must
    still probe (full scan), not die on column resolution."""
    from big_data_spark.streaming.sinks import pruned_existing_keys

    sink = str(tmp_path / "legacy_sink")
    spark.createDataFrame(
        [("a", 1), ("b", 2)], "job_title string, n int"
    ).write.parquet(sink)
    probe = pruned_existing_keys(spark, sink, "job_title", [0, 1])
    assert {r["_k"] for r in probe.collect()} == {"a", "b"}


def test_progress_listener_captures_batches(spark, tmp_path):
    """The progress listener must see every micro-batch of a drained
    availableNow stream: total input rows across events equals the
    source row count, and batch ids are distinct."""
    import time

    from big_data_spark.streaming.observability import attach_progress_listener

    src = tmp_path / "events"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "events.parquet")
    n_src = spark.read.parquet(str(src)).count()

    rec, listener = attach_progress_listener(spark)
    try:
        stream = read_events_stream(spark, str(src))
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(tmp_path / "sink"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered async; give the bus a moment
        for _ in range(40):
            if rec.total_rows() >= n_src:
                break
            time.sleep(0.25)
    finally:
        spark.streams.removeListener(listener)

    mine = [e for e in rec.events if e.num_input_rows > 0]
    assert sum(e.num_input_rows for e in mine) == n_src
    ids = [(e.query_id, e.batch_id) for e in mine]
    assert len(ids) == len(set(ids))
    assert all(
        e.batch_duration_ms is None or e.batch_duration_ms >= 0 for e in mine
    )


def test_corpus_gate_stream_matches_batch(spark, tmp_path):
    """corpus_gate_stream mounted on a documents file-stream must keep
    exactly the batch gates' fingerprint set: same survivors, one row
    per distinct fingerprint (watermarked ingestion dedup)."""
    from pyspark.sql import functions as F

    from big_data_spark.catalog import load_table
    from big_data_spark.streaming import corpus_gate_stream

    src = tmp_path / "docs"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/documents.parquet", src / "documents.parquet")

    docs_batch = load_table(spark, str(src), "documents")
    schema = docs_batch.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .format("parquet")
        .load(str(src))
        # +1 day: a ts of exactly epoch 0 (doc_id=0) would sit at the
        # stream's initial watermark and be dropped as late
        .withColumn(
            "ts", F.timestamp_micros((F.col("doc_id") + 86_400) * 1_000_000)
        )
    )
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        corpus_gate_stream(stream, ts_col="ts")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)

    want = corpus_gate_stream(docs_batch)  # batch fallback path, same exprs
    got_fps = {r["fp"] for r in got.select("fp").collect()}
    want_fps = {r["fp"] for r in want.select("fp").collect()}
    assert got_fps == want_fps
    assert got.count() == len(want_fps)  # exactly one survivor per fp
    assert got.count() > 0


def test_weighted_mix_mounts_on_stream(spark, tmp_path):
    """weighted_mix is a broadcast-join + explode map-only operator,
    so the SAME call mounts unchanged on readStream and yields exactly
    the batch result — the operator works for backfill and ingestion
    alike."""
    from pyspark.sql import functions as F

    from big_data_spark.catalog import load_table
    from big_data_spark.operators.mixing import weighted_mix

    src = tmp_path / "docs"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/documents.parquet", src / "documents.parquet")
    docs_batch = load_table(spark, str(src), "documents")
    weights = spark.createDataFrame(
        [(s, 5000 + 10000 * (i % 2)) for i, s in enumerate(
            sorted(r["source"] for r in docs_batch.select("source").distinct().collect())
        )],
        "source string, weight_bp int",
    )

    stream = (
        spark.readStream.schema(docs_batch.schema)
        .option("maxFilesPerTrigger", 2)
        .format("parquet")
        .load(str(src))
    )
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        weighted_mix(stream, weights)
        .select("source", "doc_id", "copy_id")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.read.parquet(sink).collect()))
    want = sorted(
        map(
            tuple,
            weighted_mix(docs_batch, weights)
            .select("source", "doc_id", "copy_id")
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_incremental_rollup_equals_batch_and_survives_replay(spark, tmp_path):
    """start_rollup_stream: the maintained daily rollup equals the
    direct batch aggregate over everything ingested, across multiple
    micro-batches; a full source replay on a fresh checkpoint
    overwrites its own batch partitions — no double counting."""
    from pyspark.sql import functions as F

    from big_data_spark.catalog import load_table
    from big_data_spark.streaming.sinks import read_rollup, start_rollup_stream

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "ts", "event_type", "value"
    )
    src = tmp_path / "src"
    src.mkdir()
    a = ev.limit(400)
    b = ev.subtract(a)
    a.coalesce(1).write.parquet(str(src / "a"))
    b.coalesce(1).write.parquet(str(src / "b"))

    partials = str(tmp_path / "partials")

    def run(ckpt):
        stream = (
            spark.readStream.schema(a.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_rollup_stream(stream, partials, ckpt)
        q.awaitTermination(180)

    run(str(tmp_path / "c1"))
    want = {
        (r["event_type"], r["day"]): (r["n_events"], r["sum_value"])
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    got = {
        (r["event_type"], r["day"]): (r["n_events"], r["sum_value"])
        for r in read_rollup(spark, partials).collect()
    }
    assert got == want

    # replay everything on a fresh checkpoint: batch ids restart and
    # overwrite their own partitions -> rollup unchanged
    run(str(tmp_path / "c2"))
    got2 = {
        (r["event_type"], r["day"]): (r["n_events"], r["sum_value"])
        for r in read_rollup(spark, partials).collect()
    }
    assert got2 == want


def test_streaming_trending_matches_batch_and_survives_replay(spark, tmp_path):
    """start_trending_stream: the rescale-and-add incremental decayed
    score over micro-batch partials equals q145's one-shot batch
    computation over everything ingested (float tolerance: the
    incremental form rounds per-batch weights against per-batch
    anchors), event counts match exactly, and a full replay on a
    fresh checkpoint changes nothing."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from big_data_spark.catalog import load_table
    from big_data_spark.streaming.sinks import (
        read_trending,
        start_trending_stream,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts"
    )
    src = tmp_path / "src"
    src.mkdir()
    # time-ordered micro-batches (a real stream arrives in time order,
    # so each batch's anchor advances)
    a = ev.orderBy("ts", "user_id").limit(400)
    b = ev.subtract(a)
    a.coalesce(1).write.parquet(str(src / "a"))
    b.coalesce(1).write.parquet(str(src / "b"))

    partials = str(tmp_path / "partials")

    def run(ckpt):
        stream = (
            spark.readStream.schema(a.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_trending_stream(stream, partials, ckpt)
        q.awaitTermination(180)

    run(str(tmp_path / "c1"))

    # batch truth: q145's definition over the full event set
    anchor = ev.agg(F.max(F.unix_micros("ts")).alias("t_us"))
    want = {
        r["user_id"]: (r["n_events"], r["hot_score"])
        for r in ev.crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.pow(
                0.5,
                (F.col("t_us") - F.unix_micros("ts")) / 86400000000.0,
            ).alias("wt"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("wt").alias("hot_score"),
        )
        .collect()
    }
    got = {
        r["user_id"]: (r["n_events"], r["hot_score"])
        for r in read_trending(spark, partials, k=None).collect()
    }
    assert set(got) == set(want)
    for uid, (n, s) in got.items():
        assert n == want[uid][0], uid
        assert s == _pytest.approx(want[uid][1], rel=1e-5, abs=1e-6), uid

    # replay everything on a fresh checkpoint: batches overwrite their
    # own partitions -> the merged view is unchanged
    run(str(tmp_path / "c2"))
    got2 = {
        r["user_id"]: (r["n_events"], r["hot_score"])
        for r in read_trending(spark, partials, k=None).collect()
    }
    assert got2 == got


def test_trending_compaction_preserves_view(spark, tmp_path):
    """compact_trending_partials folds finalized batch partials into
    the versioned base WITHOUT changing the merged view (rescale-and-
    add is associative), always excludes the newest batch (its replay
    window), is idempotent, and survives every crash window: an
    orphan base dir (crash before the manifest flip), resurrected
    folded partitions (crash after the flip, before cleanup), and a
    full fresh-checkpoint source replay AFTER compaction — none may
    double-count."""
    import os

    import pytest as _pytest

    from big_data_spark.catalog import load_table
    from big_data_spark.streaming.sinks import (
        compact_trending_partials,
        read_trending,
        start_trending_stream,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts"
    )
    src = tmp_path / "src"
    src.mkdir()
    ordered = ev.orderBy("ts", "user_id")
    a = ordered.limit(300)
    b = ordered.limit(600).subtract(a)
    c = ev.subtract(a).subtract(b)
    for name, part in (("a", a), ("b", b), ("c", c)):
        part.coalesce(1).write.parquet(str(src / name))

    partials = str(tmp_path / "partials")

    def run(ckpt):
        stream = (
            spark.readStream.schema(a.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_trending_stream(stream, partials, ckpt)
        q.awaitTermination(180)

    run(str(tmp_path / "ck"))

    def view():
        return {
            r["user_id"]: (r["n_events"], r["hot_score"])
            for r in read_trending(spark, partials, k=None).collect()
        }

    def assert_same(got, want):
        assert set(got) == set(want)
        for uid, (n, s) in got.items():
            assert n == want[uid][0], uid
            assert s == _pytest.approx(want[uid][1], rel=1e-6, abs=1e-6), uid

    before = view()
    import shutil as _shutil

    # stash batch 0's partial: it will be folded, and we resurrect it
    # afterwards to simulate a cleanup crash
    _shutil.copytree(
        os.path.join(partials, "batch_id=0"), str(tmp_path / "stash0")
    )
    # crash window A: an orphan base written but never flipped into
    # the manifest must be invisible (and swept by the next run)
    os.makedirs(os.path.join(partials, "_base-v7"), exist_ok=True)
    folded = compact_trending_partials(spark, partials)
    assert folded == 2  # three batches -> two finalized fold, newest kept
    names = sorted(os.listdir(partials))
    assert "_BASE" in names and "_base-v0" in names, names
    assert "_base-v7" not in names, names  # orphan swept post-flip
    assert [n for n in names if n.startswith("batch_id=")] == ["batch_id=2"]
    assert_same(view(), before)
    # idempotent: base + newest alone -> nothing foldable
    assert compact_trending_partials(spark, partials) == 0

    # crash window B: cleanup died after the flip — a folded
    # partition resurrected on disk must stay excluded by readers and
    # get swept (not re-folded) by the next compaction
    _shutil.copytree(
        str(tmp_path / "stash0"), os.path.join(partials, "batch_id=0")
    )
    assert_same(view(), before)  # excluded even though the dir exists
    assert compact_trending_partials(spark, partials) == 0
    assert not os.path.isdir(os.path.join(partials, "batch_id=0"))
    assert_same(view(), before)

    # a FRESH checkpoint would restart batch ids at 0, colliding with
    # folded ids — the write path must REJECT that generation loudly
    # (silently excluding its batches would lose genuinely new data)
    with _pytest.raises(Exception, match="different[\\s\\S]*generation"):
        run(str(tmp_path / "ck2"))
    assert_same(view(), before)  # nothing landed from the dead run


def test_streaming_hourly_anomalies_match_batch(spark, tmp_path):
    """start_cell_histogram_stream + read_hourly_anomalies: anomaly
    flags over the incrementally maintained cell histogram equal the
    q143 batch computation exactly (integer counts -> associative
    partials -> identical median/MAD inputs; the flag stage is the
    SAME shared function), and a fresh-checkpoint replay changes
    nothing."""
    from big_data_spark.catalog import load_table
    from big_data_spark.queries import QUERIES
    from big_data_spark.streaming.sinks import (
        read_hourly_anomalies,
        read_seasonal_backtest,
        start_cell_histogram_stream,
    )

    from .conftest import SF_ORACLE

    ev = load_table(spark, SF_ORACLE, "events").select("ts", "event_type")
    src = tmp_path / "src"
    src.mkdir()
    a = ev.limit(5000)
    b = ev.subtract(a)
    a.coalesce(1).write.parquet(str(src / "a"))
    b.coalesce(1).write.parquet(str(src / "b"))

    partials = str(tmp_path / "partials")

    def run(ckpt):
        stream = (
            spark.readStream.schema(a.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_cell_histogram_stream(stream, partials, ckpt)
        q.awaitTermination(180)

    run(str(tmp_path / "c1"))
    want = [
        tuple(r)
        for r in QUERIES["q143_hourly_anomalies"].fn(spark, SF_ORACLE).collect()
    ]
    got = [tuple(r) for r in read_hourly_anomalies(spark, partials).collect()]
    assert got == want and len(want) > 0

    # the SAME maintained histogram also serves q144's backtest read
    # path — identical scoring stage, so results match exactly too
    want_bt = [
        tuple(r)
        for r in QUERIES["q144_seasonal_backtest"].fn(spark, SF_ORACLE).collect()
    ]
    got_bt = [
        tuple(r) for r in read_seasonal_backtest(spark, partials).collect()
    ]
    assert got_bt == want_bt and len(want_bt) > 0

    run(str(tmp_path / "c2"))  # full replay, fresh checkpoint
    got2 = [tuple(r) for r in read_hourly_anomalies(spark, partials).collect()]
    assert got2 == want


def test_streaming_drift_matches_batch(spark, tmp_path):
    """start_drift_stream + read_drift: the PSI report over the
    incrementally maintained current-window band histogram vs the
    frozen pre-1998 reference equals q122's one-shot batch computation
    exactly (integer band counts -> associative partials -> identical
    share/ln inputs; banding and the PSI stage are the SAME shared
    functions), and a fresh-checkpoint replay changes nothing."""
    from pyspark.sql import functions as F

    from big_data_spark.catalog import load_table
    from big_data_spark.queries import QUERIES
    from big_data_spark.streaming.sinks import (
        read_drift,
        reference_band_histogram,
        start_drift_stream,
    )

    from .conftest import SF_ORACLE

    orders = load_table(spark, SF_ORACLE, "orders").select(
        "o_totalprice", "o_orderdate"
    )
    is_ref = F.col("o_orderdate") < "1998-01-01"
    reference = reference_band_histogram(orders.filter(is_ref))
    # deterministic key-parity split: an unordered limit() evaluated
    # twice (write + subtract) can pick different rows across jobs,
    # double-counting some orders and dropping others
    cur = load_table(spark, SF_ORACLE, "orders").filter(~is_ref).select(
        "o_orderkey", "o_totalprice"
    )

    src = tmp_path / "src"
    src.mkdir()
    a = cur.filter(F.col("o_orderkey") % 2 == 0)
    b = cur.filter(F.col("o_orderkey") % 2 != 0)
    assert a.count() > 0 and b.count() > 0  # both micro-batches carry data
    a.coalesce(1).write.parquet(str(src / "a"))
    b.coalesce(1).write.parquet(str(src / "b"))

    partials = str(tmp_path / "partials")

    def run(ckpt):
        stream = (
            spark.readStream.schema(a.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_drift_stream(stream, partials, ckpt)
        q.awaitTermination(180)

    run(str(tmp_path / "c1"))
    want = [
        tuple(r)
        for r in QUERIES["q122_distribution_drift"].fn(spark, SF_ORACLE).collect()
    ]
    got = [tuple(r) for r in read_drift(spark, partials, reference).collect()]
    assert got == want and len(want) > 0

    run(str(tmp_path / "c2"))  # full replay, fresh checkpoint
    got2 = [tuple(r) for r in read_drift(spark, partials, reference).collect()]
    assert got2 == want


def test_streaming_corpus_health_matches_batch(spark, tmp_path):
    """start_corpus_health_stream: the merged health view equals the
    batch computation — counts/token means exactly, distinct
    fingerprints within HLL tolerance — across micro-batches, and a
    full replay on a fresh checkpoint changes nothing."""
    from pyspark.sql import functions as F

    from big_data_spark.catalog import load_table
    from big_data_spark.operators.corpus_gates import (
        content_fingerprint,
        quality_lang_predicate,
        token_count,
    )
    from big_data_spark.streaming.sinks import (
        read_corpus_health,
        start_corpus_health_stream,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "source", "text"
    )
    src = tmp_path / "src"
    src.mkdir()
    docs.filter("doc_id < 250").coalesce(1).write.parquet(str(src / "a"))
    docs.filter("doc_id >= 250").coalesce(1).write.parquet(str(src / "b"))

    partials = str(tmp_path / "partials")

    def run(ckpt):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_corpus_health_stream(stream, partials, ckpt)
        q.awaitTermination(180)

    run(str(tmp_path / "c1"))

    exact = {
        r["source"]: r
        for r in docs.select(
            "source",
            token_count("text").cast("long").alias("n_tokens"),
            F.when(quality_lang_predicate("text"), 1).otherwise(0).alias("qp"),
            content_fingerprint("text").alias("fp"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("qp").cast("long").alias("n_quality_pass"),
            F.count_distinct("fp").alias("n_unique"),
            (
                F.sum(F.col("n_tokens").cast("decimal(27,0)")).cast("double")
                / F.count("*")
            ).alias("avg_tokens"),
        )
        .collect()
    }
    got = {r["source"]: r for r in read_corpus_health(spark, partials).collect()}
    assert set(got) == set(exact)
    for src_name, e in exact.items():
        g = got[src_name]
        assert g["n_docs"] == e["n_docs"]
        assert g["n_quality_pass"] == e["n_quality_pass"]
        assert abs(g["avg_tokens"] - e["avg_tokens"]) < 1e-9
        assert abs(g["approx_unique"] - e["n_unique"]) / e["n_unique"] < 0.05

    run(str(tmp_path / "c2"))  # replay: batch ids restart, overwrite
    got2 = {r["source"]: r for r in read_corpus_health(spark, partials).collect()}
    assert {k: v["n_docs"] for k, v in got2.items()} == {
        k: v["n_docs"] for k, v in got.items()
    }


def test_streaming_active_users_matches_batch(spark, tmp_path):
    """start_active_users_stream (q133's incremental twin): the
    merged DAU/WAU view from per-micro-batch HLL partials equals the
    SAME sketch math over a one-shot batch pass exactly (HLL
    registers are elementwise max, so micro-batch partitioning is
    invisible to the union), tracks q133's exact distinct counts
    within the sketch bound, and a true post-commit crash replay
    (deleted commits/N) changes nothing."""
    import contextlib
    import os

    from pyspark.sql import functions as F

    from big_data_spark.catalog import load_table
    from big_data_spark.streaming.sinks import (
        read_active_users,
        start_active_users_stream,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts"
    )
    src = tmp_path / "src"
    src.mkdir()
    # three time-ordered micro-batches
    ordered = ev.orderBy("ts", "user_id")
    a = ordered.limit(400)
    b = ordered.limit(800).subtract(a)
    c = ev.subtract(a).subtract(b)
    for name, part in (("a", a), ("b", b), ("c", c)):
        part.coalesce(1).write.parquet(str(src / name))

    partials = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ck")

    def run(ck):
        stream = (
            spark.readStream.schema(a.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_active_users_stream(stream, partials, ck)
        q.awaitTermination(180)

    run(ckpt)
    got = {
        r["day"]: (r["dau"], r["wau"])
        for r in read_active_users(spark, partials).collect()
    }

    # batch twin: ONE daily-sketch partial over everything, read
    # through the identical path — mergeability makes them equal
    batch_partials = str(tmp_path / "batch_partials")
    (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.hll_sketch_agg("user_id").alias("users_hll"),
            F.count("*").alias("n_events"),
        )
        .withColumn("batch_id", F.lit(0))
        .write.partitionBy("batch_id")
        .parquet(batch_partials)
    )
    want = {
        r["day"]: (r["dau"], r["wau"])
        for r in read_active_users(spark, batch_partials).collect()
    }
    assert got == want

    # exact anchor: q133's pair-explode DAU/WAU, within HLL bound
    du = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    bounds = du.agg(F.max("day").alias("dmax"))
    exact_dau = {
        r["day"]: r["dau"]
        for r in du.groupBy("day").agg(F.count("*").alias("dau")).collect()
    }
    exact_wau = {
        r["wend"]: r["wau"]
        for r in du.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.col("day") + F.expr("INTERVAL 6 DAY"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("wend"),
        )
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("wend") <= F.col("dmax"))
        .select("wend", "user_id")
        .distinct()
        .groupBy("wend")
        .agg(F.count("*").alias("wau"))
        .collect()
    }
    assert set(got) == set(exact_dau)
    for day, (dau, wau) in got.items():
        assert abs(dau - exact_dau[day]) / exact_dau[day] < 0.05, day
        assert abs(wau - exact_wau[day]) / exact_wau[day] < 0.05, day

    # post-commit crash replay: the last batch re-lands identical
    n = max(
        int(f) for f in os.listdir(os.path.join(ckpt, "commits"))
        if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", str(n)))
    with contextlib.suppress(FileNotFoundError):
        os.remove(os.path.join(ckpt, "commits", f".{n}.crc"))
    run(ckpt)
    got2 = {
        r["day"]: (r["dau"], r["wau"])
        for r in read_active_users(spark, partials).collect()
    }
    assert got2 == got


def test_streaming_rfm_matches_batch_exactly(spark, tmp_path):
    """start_rfm_stream (q142's incremental twin): every per-customer
    input is an associative sufficient statistic (max date / count /
    exact-decimal sum), so the merged streaming view must equal
    q142's one-shot batch output EXACTLY — same quintile buckets,
    same segments, no tolerance — and a post-commit crash replay
    changes nothing."""
    import contextlib
    import os

    from big_data_spark.catalog import load_table
    from big_data_spark.queries import QUERIES
    from big_data_spark.streaming.sinks import read_rfm, start_rfm_stream

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    src = tmp_path / "src"
    src.mkdir()
    # key-parity split into three micro-batches (deterministic)
    for name, pred in (
        ("a", "o_custkey % 3 = 0"),
        ("b", "o_custkey % 3 = 1"),
        ("c", "o_custkey % 3 = 2"),
    ):
        orders.filter(pred).coalesce(1).write.parquet(str(src / name))

    partials = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ck")

    def run(ck):
        stream = (
            spark.readStream.schema(orders.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_rfm_stream(stream, partials, ck)
        q.awaitTermination(180)

    run(ckpt)
    got = [tuple(r) for r in read_rfm(spark, partials).collect()]
    want = [
        tuple(r) for r in QUERIES["q142_rfm_segments"].fn(spark, sf).collect()
    ]
    assert got == want

    # post-commit crash replay: the last batch re-lands identically
    n = max(
        int(f) for f in os.listdir(os.path.join(ckpt, "commits"))
        if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", str(n)))
    with contextlib.suppress(FileNotFoundError):
        os.remove(os.path.join(ckpt, "commits", f".{n}.crc"))
    run(ckpt)
    assert [tuple(r) for r in read_rfm(spark, partials).collect()] == want


def test_streaming_cusum_matches_batch_exactly(spark, tmp_path):
    """start_daily_revenue_stream (q163's incremental twin): the
    per-day revenue partial is an associative exact-decimal sum, so
    the merged streaming view re-scored through the shared
    cusum_scan must equal q163's one-shot batch output EXACTLY —
    same cusum values, same peak flag — and a post-commit crash
    replay changes nothing. The split is by DAY PARITY, so single
    days straddle batches and the merge path is actually exercised
    ... (each batch still contains every-other day; the third file
    re-delivers a subset of days to force cross-batch day merges)."""
    import contextlib
    import os

    from big_data_spark.catalog import load_table
    from big_data_spark.queries import QUERIES
    from big_data_spark.streaming.sinks import (
        read_cusum,
        start_daily_revenue_stream,
    )

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    src = tmp_path / "src"
    src.mkdir()
    # split WITHIN days (row-hash parity) so the same day lands in
    # multiple micro-batches and the decimal merge is exercised
    for name, pred in (
        ("a", "crc32(cast(o_totalprice as string)) % 3 = 0"),
        ("b", "crc32(cast(o_totalprice as string)) % 3 = 1"),
        ("c", "crc32(cast(o_totalprice as string)) % 3 = 2"),
    ):
        orders.filter(pred).coalesce(1).write.parquet(str(src / name))

    partials = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ck")

    def run(ck):
        stream = (
            spark.readStream.schema(orders.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_daily_revenue_stream(stream, partials, ck)
        q.awaitTermination(180)

    run(ckpt)
    got = [tuple(r) for r in read_cusum(spark, partials).collect()]
    want = [
        tuple(r)
        for r in QUERIES["q163_cusum_changepoint"].fn(spark, sf).collect()
    ]
    assert got == want

    # post-commit crash replay: the last batch re-lands identically
    n = max(
        int(f) for f in os.listdir(os.path.join(ckpt, "commits"))
        if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", str(n)))
    with contextlib.suppress(FileNotFoundError):
        os.remove(os.path.join(ckpt, "commits", f".{n}.crc"))
    run(ckpt)
    assert [tuple(r) for r in read_cusum(spark, partials).collect()] == want


def test_streaming_calibration_matches_batch_exactly(spark, tmp_path):
    """start_calibration_stream (q164's live-monitoring twin): each
    batch scores through the SHARED clf_score_frame and lands
    associative bin statistics, so the merged reliability table must
    equal q164's one-shot output EXACTLY — and a post-commit crash
    replay changes nothing. Docs split by doc_id parity so every
    score bin accumulates across batches."""
    import contextlib
    import os

    from big_data_spark.catalog import load_table
    from big_data_spark.queries import QUERIES
    from big_data_spark.streaming.sinks import (
        read_calibration,
        start_calibration_stream,
    )

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "text"
    )
    src = tmp_path / "src"
    src.mkdir()
    for name, pred in (
        ("a", "doc_id % 3 = 0"),
        ("b", "doc_id % 3 = 1"),
        ("c", "doc_id % 3 = 2"),
    ):
        docs.filter(pred).coalesce(1).write.parquet(str(src / name))

    partials = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ck")

    def run(ck):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_calibration_stream(stream, partials, ck)
        q.awaitTermination(180)

    run(ckpt)
    got = [tuple(r) for r in read_calibration(spark, partials).collect()]
    want = [
        tuple(r)
        for r in QUERIES["q164_calibration_bins"].fn(spark, sf).collect()
    ]
    assert got == want

    # post-commit crash replay: the last batch re-lands identically
    n = max(
        int(f) for f in os.listdir(os.path.join(ckpt, "commits"))
        if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", str(n)))
    with contextlib.suppress(FileNotFoundError):
        os.remove(os.path.join(ckpt, "commits", f".{n}.crc"))
    run(ckpt)
    assert [
        tuple(r) for r in read_calibration(spark, partials).collect()
    ] == want


def test_streaming_lm_matches_batch_exactly(spark, tmp_path):
    """start_lm_stream (q110's model maintainer): token counts are
    associative, so the merged live model must equal the one-shot
    model built through the SAME unigram_lm_from_counts — exactly,
    token for token — and a post-commit crash replay changes
    nothing."""
    import contextlib
    import os

    from pyspark.sql import functions as F

    from big_data_spark.catalog import load_table
    from big_data_spark.queries import unigram_lm_from_counts
    from big_data_spark.streaming.sinks import read_lm, start_lm_stream

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    src = tmp_path / "src"
    src.mkdir()
    for name, pred in (
        ("a", "doc_id % 3 = 0"),
        ("b", "doc_id % 3 = 1"),
        ("c", "doc_id % 3 = 2"),
    ):
        docs.filter(pred).coalesce(1).write.parquet(str(src / name))

    partials = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ck")

    def run(ck):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_lm_stream(stream, partials, ck)
        q.awaitTermination(180)

    run(ckpt)
    want_counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    want = sorted(
        tuple(r) for r in unigram_lm_from_counts(want_counts).collect()
    )
    got = sorted(tuple(r) for r in read_lm(spark, partials).collect())
    assert got == want

    # post-commit crash replay: the last batch re-lands identically
    n = max(
        int(f) for f in os.listdir(os.path.join(ckpt, "commits"))
        if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", str(n)))
    with contextlib.suppress(FileNotFoundError):
        os.remove(os.path.join(ckpt, "commits", f".{n}.crc"))
    run(ckpt)
    assert sorted(tuple(r) for r in read_lm(spark, partials).collect()) == want


def test_contract_gate_stream_blocks_violating_batch(spark, tmp_path):
    """Streaming data-contract gate: a clean batch lands (with its
    verdict report); a violating batch writes its report and FAILS
    the query — its data never reaches the table."""
    import json as _json

    from pyspark.sql import functions as F

    from big_data_spark.operators.quality_checks import (
        Check,
        completeness,
        in_range,
    )
    from big_data_spark.streaming.sinks import start_contract_gate_stream

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    rep = str(tmp_path / "rep")
    ckpt = str(tmp_path / "ckpt")
    checks = [
        Check("complete(name)", completeness("name"), lambda v: v == 1.0),
        Check("amount_in_0_100", in_range("amount", 0, 100), lambda v: v == 1.0),
    ]
    schema = "id long, name string, amount double"

    def gate_query():
        stream = spark.readStream.schema(schema).json(str(src))
        return start_contract_gate_stream(stream, checks, out, ckpt, rep)

    with open(src / "clean.json", "w") as f:
        for i in range(5):
            f.write(_json.dumps({"id": i, "name": f"n{i}", "amount": 10.0 * i}) + "\n")
    gate_query().awaitTermination(120)
    assert spark.read.parquet(out).count() == 5
    reports = spark.read.parquet(rep)
    assert reports.filter(~F.col("passed")).count() == 0

    # second batch violates both constraints
    with open(src / "dirty.json", "w") as f:
        f.write(_json.dumps({"id": 9, "name": None, "amount": 500.0}) + "\n")
    from pyspark.errors.exceptions.captured import StreamingQueryException

    q = gate_query()
    with pytest.raises(StreamingQueryException, match="contract violated"):
        q.awaitTermination(120)

    # violating data never landed; the violation IS observable in the report
    landed = spark.read.parquet(out)
    assert landed.count() == 5 and landed.filter(F.col("id") == 9).count() == 0
    reports = spark.read.parquet(rep)
    failed = {
        r["constraint"] for r in reports.filter(~F.col("passed")).collect()
    }
    assert failed == {"complete(name)", "amount_in_0_100"}


def test_contract_gate_stream_skips_empty_batch(spark, tmp_path):
    """A no-data batch (empty source at start) must pass through the
    gate without raising or landing anything — 0/0 observations fail
    closed, so evaluating the suite on an empty batch would wedge
    the stream permanently."""
    import json as _json
    import os

    from big_data_spark.operators.quality_checks import Check, completeness
    from big_data_spark.streaming.sinks import start_contract_gate_stream

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    checks = [
        Check("complete(name)", completeness("name"), lambda v: v == 1.0)
    ]
    schema = "id long, name string"
    # an empty file yields a batch with zero rows
    (src / "empty.json").write_text("")
    q = start_contract_gate_stream(
        spark.readStream.schema(schema).json(str(src)), checks, out, ckpt
    )
    q.awaitTermination(120)  # must not raise
    assert not os.path.exists(out) or spark.read.parquet(out).count() == 0
    # a following clean batch still lands
    with open(src / "clean.json", "w") as f:
        f.write(_json.dumps({"id": 1, "name": "a"}) + "\n")
    q = start_contract_gate_stream(
        spark.readStream.schema(schema).json(str(src)), checks, out, ckpt
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 1


def test_trending_post_commit_crash_replay_same_generation(spark, tmp_path):
    """The precise replay contract the partials sinks document: a
    crash AFTER a batch's write but BEFORE its checkpoint commit
    replays that batch with the SAME id on restart, and the dynamic
    overwrite makes it a no-op. Also validates the compaction rule
    'the newest batch never folds': after compacting, the same-
    generation crash-replay of the newest batch is still accepted by
    the generation guard and still changes nothing."""
    import contextlib
    import os

    import pytest as _pytest

    from big_data_spark.catalog import load_table
    from big_data_spark.streaming.sinks import (
        compact_trending_partials,
        read_trending,
        start_trending_stream,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts"
    )
    src = tmp_path / "src"
    src.mkdir()
    ordered = ev.orderBy("ts", "user_id")
    n = ev.count()
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        part = ordered.limit(cuts[i + 1]).subtract(ordered.limit(cuts[i]))
        part.coalesce(1).write.parquet(str(src / f"p{i}"))

    partials = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ck")

    def run():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_trending_stream(stream, partials, ckpt)
        q.awaitTermination(180)

    def crash_replay(batch_id: int):
        os.remove(os.path.join(ckpt, "commits", str(batch_id)))
        with contextlib.suppress(FileNotFoundError):
            os.remove(os.path.join(ckpt, "commits", f".{batch_id}.crc"))
        run()

    def view():
        return {
            r["user_id"]: (r["n_events"], r["hot_score"])
            for r in read_trending(spark, partials, k=None).collect()
        }

    run()
    before = view()
    crash_replay(2)  # pre-compaction: replayed newest batch no-ops
    assert view() == before

    assert compact_trending_partials(spark, partials) == 2
    got = view()
    assert set(got) == set(before)
    for uid, (cnt, s) in got.items():
        assert cnt == before[uid][0]
        assert s == _pytest.approx(before[uid][1], rel=1e-6, abs=1e-6)

    # post-compaction: the newest batch (id 2) stayed unfolded, so
    # its same-generation crash-replay is accepted and still a no-op
    crash_replay(2)
    got2 = view()
    assert set(got2) == set(got)
    for uid, (cnt, s) in got2.items():
        assert cnt == got[uid][0]
        assert s == _pytest.approx(got[uid][1], rel=1e-9, abs=1e-9)


def test_streamed_word_table_trains_identical_tokenizer(spark, tmp_path):
    """read_word_table over start_lm_stream's partials: the
    stream-maintained vocabulary must train EXACTLY the tokenizer the
    batch word table trains — merge-for-merge (BPE) and
    piece-for-piece (unigram) — so a retrain never needs the
    corpus-scale pass the stream already paid incrementally."""
    from big_data_spark.catalog import load_table
    from big_data_spark.operators.tokenizer import bpe_word_table, train_bpe
    from big_data_spark.operators.unigram import train_unigram
    from big_data_spark.streaming.sinks import (
        read_word_table,
        start_lm_stream,
    )

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    src = tmp_path / "src"
    src.mkdir()
    for name, pred in (("a", "doc_id % 2 = 0"), ("b", "doc_id % 2 = 1")):
        docs.filter(pred).coalesce(1).write.parquet(str(src / name))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = start_lm_stream(
        stream, str(tmp_path / "partials"), str(tmp_path / "ck")
    )
    q.awaitTermination(180)

    live = read_word_table(
        spark, str(tmp_path / "partials"), token_pattern="^[a-z]+$"
    )
    batch = bpe_word_table(docs, token_pattern="^[a-z]+$")
    assert sorted(tuple(r) for r in live.collect()) == sorted(
        tuple(r) for r in batch.collect()
    )

    got_bpe = train_bpe(live, num_merges=6)
    want_bpe = train_bpe(batch, num_merges=6)
    assert [(m.left, m.right, m.n) for m in got_bpe] == [
        (m.left, m.right, m.n) for m in want_bpe
    ]

    got_uni = train_unigram(live, vocab_size=20, seed_size=30, max_piece_len=4)
    want_uni = train_unigram(
        batch, vocab_size=20, seed_size=30, max_piece_len=4
    )
    assert [(p.piece, p.logp, p.count) for p in got_uni] == [
        (p.piece, p.logp, p.count) for p in want_uni
    ]


def test_streamed_word_table_pre_tokenized(spark, tmp_path):
    """start_lm_stream(pre_tokenize=True): a word table streamed for
    a pre-tokenized trainer must tokenize micro-batches exactly as
    bpe_word_table(pre_tokenize=True) does at batch build — same
    letter/digit/punct runs, same counts — or retraining from the
    live table would drift from the batch tokenizer (the shared
    tokenization contract, round 10)."""
    from big_data_spark.operators.tokenizer import bpe_word_table
    from big_data_spark.streaming.sinks import (
        read_word_table,
        start_lm_stream,
    )

    docs = spark.createDataFrame(
        [
            (1, "C++ .NET (3-5 năm) từ 25,000,000 VND/tháng"),
            (2, "Python, SQL, Excel — 10 - 15 triệu"),
            (3, "không yêu cầu kinh nghiệm (intern)"),
            (4, None),
        ],
        "doc_id int, text string",
    )
    src = tmp_path / "src"
    src.mkdir()
    for name, pred in (("a", "doc_id <= 2"), ("b", "doc_id > 2")):
        docs.filter(pred).coalesce(1).write.parquet(str(src / name))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = start_lm_stream(
        stream,
        str(tmp_path / "partials"),
        str(tmp_path / "ck"),
        pre_tokenize=True,
    )
    q.awaitTermination(180)

    live = read_word_table(spark, str(tmp_path / "partials"))
    batch = bpe_word_table(docs.filter("text IS NOT NULL"), pre_tokenize=True)
    assert sorted(tuple(r) for r in live.collect()) == sorted(
        tuple(r) for r in batch.collect()
    )


def test_streaming_bundle_encode_matches_batch_and_replays(spark, tmp_path):
    """start_bundle_encode_stream: a frozen bundle streamed over the
    documents table must emit exactly the batch id encode per doc
    (the encode is doc-pure, so batching cannot change ids), and
    restarting the stream with a fresh checkpoint over the same sink
    must rewrite identical bytes, not duplicates (batch_id-keyed
    dynamic partition overwrite)."""
    from pyspark.sql import functions as F

    from big_data_spark.catalog import load_table
    from big_data_spark.operators.tokenizer import (
        TokenizerBundle,
        bpe_vocab_pieces,
        bpe_word_table,
        encode_corpus_with_bundle,
        train_bpe,
        with_byte_fallback_pieces,
    )
    from big_data_spark.streaming.sinks import start_bundle_encode_stream

    src = tmp_path / "docs"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/documents.parquet", src / "documents.parquet")
    docs = load_table(spark, str(src), "documents")

    words = bpe_word_table(docs, token_pattern="^[a-z]{4,}$")
    merges = train_bpe(words, num_merges=4)
    pieces = with_byte_fallback_pieces(bpe_vocab_pieces(words, merges))
    bundle = TokenizerBundle(
        merges=list(merges), pieces=pieces, pre_tokenize=None,
        oov_fallback="bytes",
    )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
    )
    sink, ckpt = str(tmp_path / "enc"), str(tmp_path / "ckpt")
    q = start_bundle_encode_stream(stream, bundle, sink, ckpt)
    assert q.awaitTermination(180)

    got = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        r["doc_id"]: list(r["doc_tokens"])
        for r in encode_corpus_with_bundle(
            docs, bundle, emit_ids=True
        ).collect()
    }
    assert got == want
    assert any(got.values())  # non-trivial ids flowed

    # replay: a new checkpoint re-processes everything into the same
    # sink; batch_id-keyed overwrite keeps exactly one copy per doc
    q2 = start_bundle_encode_stream(
        stream, bundle, sink, str(tmp_path / "ckpt2")
    )
    assert q2.awaitTermination(180)
    again = spark.read.parquet(sink)
    assert again.count() == len(want)
    assert {
        r["doc_id"]: list(r["doc_tokens"]) for r in again.collect()
    } == want
