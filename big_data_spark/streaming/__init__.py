"""Structured Streaming wrappers (SURVEY §2.9, §3.1).

The reference's streaming job is a stateless map->filter->append
pipeline (Kafka -> parse -> clean -> Cassandra, job_streaming.py).
Here the SAME batch transform (operators.job_etl.clean_job_postings)
mounts unchanged on ``readStream`` — the logical plan is identical,
only the source/sink differ. On top we add the idiomatic extensions
the reference lacks (SURVEY §2.9 "absent" list): watermarked tumbling
windows and an ``applyInPandasWithState`` sessionizer.

Kafka sources (S1) are configuration, not code: swap
``readStream.format("parquet"/"json")`` for ``format("kafka")`` +
``from_json(col("value").cast("string"), schema)`` (S2) and the rest
of the pipeline is untouched. Tests use file sources so the suite
runs without a broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.job_etl import clean_job_postings
from ..schemas import EVENTS_SCHEMA, JOB_POSTING_RAW_SCHEMA


def read_postings_stream(spark: SparkSession, source_dir: str, fmt: str = "json") -> DataFrame:
    """File-source stand-in for the Kafka topic (S1/S2).

    maxFilesPerTrigger bounds micro-batch size the way Kafka's
    maxOffsetsPerTrigger would.
    """
    return (
        spark.readStream.schema(JOB_POSTING_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .format(fmt)
        .load(source_dir)
    )


def read_postings_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int = 1000,
) -> DataFrame:
    """Real Kafka source (S1, job_streaming.py:47-53): value bytes ->
    from_json with the posting schema (S2) -> same downstream pipeline
    as the file stand-in. Needs the spark-sql-kafka connector on the
    classpath and a reachable broker; the env-gated smoke test
    exercises this path when KAFKA_BOOTSTRAP is set and otherwise
    pins the config-swap shape up to the connector boundary.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", max_offsets_per_trigger)
        .load()
    )
    return parse_kafka_postings(raw)


def parse_kafka_postings(raw: DataFrame) -> DataFrame:
    """The S2 parse chain applied to Kafka's wire schema (key/value
    binary + topic/partition/offset metadata): value bytes ->
    from_json(posting schema) -> unwrap. Split out so schema parity
    with the file stand-in is testable without a broker — the same
    expression tree runs on any DataFrame carrying a binary ``value``
    column, batch or stream."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), JOB_POSTING_RAW_SCHEMA).alias("j")
    ).select("j.*")


def stream_clean_postings(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    fmt: str = "json",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming ETL: source -> clean_job_postings -> parquet append.

    Parity: job_streaming.py:164-170 (append mode + checkpoint; T1-T4)
    with parquet standing in for the Cassandra sink (S3). Exactly-once
    comes from the checkpoint WAL + idempotent file sink.
    """
    raw = read_postings_stream(spark, source_dir, fmt)
    cleaned = clean_job_postings(raw, deterministic_id=True)
    writer = (
        cleaned.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _events_ts_is_int64_nanos(source_dir: str) -> bool:
    """Peek one parquet footer: older testdata generations wrote ts
    as timestamp[ns] (only readable as long nanos), newer ones as
    timestamp[us] (readable straight into TimestampType)."""
    import glob
    import os

    try:
        import pyarrow.parquet as pq
    except Exception:
        return False
    for p in sorted(glob.glob(os.path.join(source_dir, "*.parquet"))):
        try:
            return str(pq.read_schema(p).field("ts").type) == "timestamp[ns]"
        except Exception:
            continue
    return False


def read_events_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """Parquet file-source stream over the events table layout.

    The declared schema adapts to the physical generation (see
    catalog.load_table for the batch twin): timestamp[ns] files are
    declared long (session's nanosAsLong conf) and converted;
    timestamp[us] files read directly into TimestampType — the
    session runs UTC, so wall-clock values are identical either way.
    """
    if _events_ts_is_int64_nanos(source_dir):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw_schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in EVENTS_SCHEMA.fields
            ]
        )
        return (
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", 4)
            .format("parquet")
            .load(source_dir)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .format("parquet")
        .load(source_dir)
    )


def enriched_event_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static broadcast join (SURVEY §2.9 lists stream joins as
    absent in the reference; this is the idiomatic extension).

    The static dimension is broadcast to every task of every
    micro-batch — no state, no shuffle of the stream side; at 100 TB/
    day this is the only join shape that costs nothing extra.
    """
    return events.join(F.broadcast(dim), "event_type", "left")


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts by event_type.

    The streaming twin of queries.q19_event_windows — same window
    bucketing, plus the late-data bound the reference never set
    (SURVEY §2.9: no watermarks anywhere). State size is bounded by
    |event types| x windows-in-watermark, independent of input rate.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def join_event_streams(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "2 hours",
    max_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval bound
    (SURVEY §2.9 lists every stream-join shape as absent in the
    reference; stream-static is `enriched_event_stream`, this is the
    symmetric case).

    Both sides carry watermarks and the join condition bounds the
    event-time distance, so each side's buffered state is limited to
    watermark + max_delay of data — without the time bound Spark
    would have to buffer both streams forever. Keyed on user_id, so
    state is hash-partitioned and per-key bounded at any input rate.

    ``how="left_outer"`` (or right/full) emits the null-padded row
    once the watermark proves no match can still arrive — outer
    stream joins REQUIRE the watermark + time bound for exactly this
    reason (the engine must know when to give up on a match).
    """
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    return l.join(
        r,
        F.expr(
            f"""
            l.user_id = r.user_id
            AND r.ts BETWEEN l.ts AND l.ts + INTERVAL {max_delay}
            """
        ),
        how,
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_type").alias("left_type"),
        F.col("r.event_type").alias("right_type"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
    )


def dedup_stream_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact-dedup: drops rows whose ``keys`` repeat within
    the watermark horizon (`dropDuplicatesWithinWatermark`) — the
    ingestion-dedup stage of a streaming corpus pipeline (duplicate
    submissions, at-least-once sources, replayed webhooks).

    Unlike plain streaming dropDuplicates, whose state grows with
    every key ever seen, the within-watermark form evicts key state
    once the watermark passes it — state is bounded by keys-per-
    watermark-window at any input rate, the only form that survives
    an unbounded stream. Exactly-once per key within the horizon;
    duplicates farther apart than the watermark are the batch dedup
    path's job (q43/q47).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def corpus_quality_gates(
    docs: DataFrame, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The stateless corpus gates of queries.q67 — token-count +
    stopword-ratio quality gate and stopword-hit language gate —
    plus the md5 content fingerprint, as pure column expressions that
    mount identically on batch and streaming inputs. The expressions
    are BUILT FROM operators.corpus_gates (the single source of
    truth q67 and q101 also use), so stream==batch holds by
    construction, not by parallel maintenance."""
    from ..operators.corpus_gates import (
        content_fingerprint,
        quality_lang_predicate,
        token_count,
    )

    return docs.select(
        "doc_id",
        "text",
        *extra_cols,
        token_count("text").cast("long").alias("n_tokens"),
        content_fingerprint("text").alias("fp"),
    ).where(quality_lang_predicate("text"))


def corpus_gate_stream(
    docs: DataFrame,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming corpus-prep front end: the STATELESS gates of the
    batch capstone (queries.q67 — token-count + stopword-ratio
    quality gate, stopword-hit language gate; expression-identical,
    so stream==batch by construction) followed by exact-fingerprint
    ingestion dedup.

    With ``ts_col`` the dedup is ``dropDuplicatesWithinWatermark`` on
    the md5 fingerprint — state bounded by fingerprints-per-watermark
    at any rate. Without a time column it falls back to plain
    ``dropDuplicates`` (state grows with distinct fingerprints —
    bounded-backfill use only). Near-dup LSH stays batch-side (q47/
    q66): its min-representative fixpoint needs corpus-wide state no
    stream should hold.
    """
    gated = corpus_quality_gates(docs, extra_cols=(ts_col,) if ts_col else ())
    if ts_col is not None:
        return gated.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["fp"]
        )
    return gated.dropDuplicates(["fp"])
