"""Custom streaming sinks via foreachBatch.

The reference writes straight to Cassandra with the connector's sink
(S3); foreachBatch is the Spark-idiomatic escape hatch when the sink
needs per-batch logic — here, key-level idempotent upsert into a
parquet table (dedup against already-landed keys).

Scale design: the sink is hash-partitioned on the key into
``_kb=pmod(xxhash64(key), n_buckets)`` directories, and each
micro-batch's existing-keys probe reads ONLY the buckets that batch
touches (static partition pruning — the batch's bucket ids are
collected to the driver, a bounded ≤n_buckets list of ints). The probe
cost therefore tracks the batch's key spread, not the total keys ever
landed; the unbucketed variant re-scanned the whole sink every batch
and grew without bound. The real-world production path for this
pattern is a table format with MERGE support (e.g. Delta/Iceberg
``MERGE INTO``) — this sink reproduces those semantics on plain
parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

DEFAULT_KEY_BUCKETS = 64


def touched_key_buckets(batch: DataFrame, key: str, n_buckets: int) -> list[int]:
    """Distinct ``_kb`` bucket ids present in a batch (bounded by
    n_buckets, so the collect is a constant-size driver list)."""
    rows = (
        batch.select(
            F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).alias("_kb")
        )
        .distinct()
        .collect()
    )
    return sorted(int(r["_kb"]) for r in rows)


def pruned_existing_keys(
    spark, sink_dir: str, key: str, buckets: list[int]
) -> DataFrame:
    """Key column of sink rows in the given buckets only — the ``_kb``
    filter is a partition filter, so untouched bucket directories are
    never read (asserted in tests/test_streaming.py via the scan's
    partition-filter plan node)."""
    return (
        spark.read.parquet(sink_dir)
        .filter(F.col("_kb").isin(buckets))
        .select(key)
        .withColumnRenamed(key, "_k")
    )


def start_upsert_stream(
    stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    key: str,
    available_now: bool = True,
    n_buckets: int = DEFAULT_KEY_BUCKETS,
) -> StreamingQuery:
    """Append only rows whose ``key`` is not yet in the sink.

    Combined with the checkpoint WAL this gives at-most-once per key
    across restarts AND across overlapping replays of the source —
    stronger than the plain file sink's file-level exactly-once. The
    sink table carries a ``_kb`` hash-bucket partition column (see
    module docstring); readers that don't care can just drop it.
    """

    def upsert(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        fresh = batch.dropDuplicates([key]).withColumn(
            "_kb", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))
        )
        if os.path.exists(sink_dir):
            buckets = touched_key_buckets(batch, key, n_buckets)
            existing = pruned_existing_keys(spark, sink_dir, key, buckets)
            # null-safe anti join: a plain equi-join never matches a
            # NULL key, which would re-append null-key rows forever
            # (xxhash64(NULL) is a fixed seed value, so null keys land
            # in a deterministic bucket and prune like any other)
            fresh = fresh.join(
                existing, fresh[key].eqNullSafe(F.col("_k")), "left_anti"
            )
        fresh.write.mode("append").partitionBy("_kb").parquet(sink_dir)

    writer = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_scd2_stream(
    stream: DataFrame,
    dim_dir: str,
    checkpoint_dir: str,
    key: str,
    tracked: list[str],
    ts_col: str = "ts",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming SCD-2 dimension maintenance: each micro-batch of
    updates merges into the versioned dimension snapshot via
    operators.scd.scd2_apply and the snapshot is atomically replaced.

    The read-merge-overwrite per batch is correct because foreachBatch
    serializes batches; the checkpoint WAL replays a crashed batch
    onto the prior snapshot. Scope: DIMENSION tables (bounded,
    versions included) — the merged snapshot round-trips through the
    driver to break the read-then-overwrite cycle on the same path,
    which is fine at dimension scale and exactly where a production
    deployment swaps in a table format's MERGE INTO (no rewrite, no
    driver round-trip) with identical close-changed / open-new /
    pass-history semantics.
    """
    from ..operators.scd import scd2_apply

    def merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if os.path.exists(dim_dir):
            dim = spark.read.parquet(dim_dir)
        else:
            dim = (
                batch.select(
                    key,
                    *tracked,
                    F.col(ts_col).alias("valid_from"),
                    F.lit(None).cast("timestamp").alias("valid_to"),
                    F.lit(True).alias("is_current"),
                )
                .limit(0)
            )
        merged = scd2_apply(dim, batch, key=key, tracked=tracked, ts_col=ts_col)
        # materialize before overwriting the input's source files
        rows = merged.collect()
        spark.createDataFrame(rows, merged.schema).write.mode("overwrite").parquet(
            dim_dir
        )

    writer = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
