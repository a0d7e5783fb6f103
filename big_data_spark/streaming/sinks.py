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

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

DEFAULT_KEY_BUCKETS = 64
_BUCKET_SIDECAR = "_n_buckets"


def _has_committed_files(d: str) -> bool:
    """True iff the directory holds committed data (data files or
    ``_kb=`` partition directories) — not just _temporary/_SUCCESS/
    sidecar debris from a killed or not-yet-started write."""
    if not os.path.isdir(d):
        return False
    for n in os.listdir(d):
        if n.startswith("_kb="):
            return True
        if n.startswith(("_", ".")):
            continue
        return True
    return False


def _validate_bucket_count(sink_dir: str, n_buckets: int) -> None:
    """Pin the sink's bucket count across restarts. The ``_kb``
    partition values are hash mod n_buckets; restarting with a
    DIFFERENT count would prune against the wrong directories and
    silently re-append keys that already landed. First writer records
    the count in a sidecar; later runs must match it."""
    sidecar = os.path.join(sink_dir, _BUCKET_SIDECAR)
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            recorded = int(f.read().strip())
        if recorded != n_buckets:
            raise ValueError(
                f"sink {sink_dir} was written with n_buckets={recorded}; "
                f"restarting with n_buckets={n_buckets} would break "
                "bucket pruning and duplicate keys"
            )
        return
    os.makedirs(sink_dir, exist_ok=True)
    tmp = sidecar + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(n_buckets))
    os.replace(tmp, sidecar)


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
    partition-filter plan node).

    A sink directory written by an external/legacy layout may lack the
    ``_kb`` partition column; fall back to the full-scan probe (still
    correct, just unpruned) instead of failing column resolution
    mid-batch.
    """
    existing = spark.read.parquet(sink_dir)
    if "_kb" in existing.columns:
        existing = existing.filter(F.col("_kb").isin(buckets))
    return existing.select(key).withColumnRenamed(key, "_k")


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
        _validate_bucket_count(sink_dir, n_buckets)
        fresh = batch.dropDuplicates([key]).withColumn(
            "_kb", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))
        )
        # probe only when COMMITTED data files exist — a killed first
        # write can leave sink_dir with just _temporary/_SUCCESS, and
        # reading that raises 'Unable to infer schema' on every replay
        if _has_committed_files(sink_dir):
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


SCD2_MANIFEST = "_CURRENT"


def _scd2_current_version(dim_dir: str) -> str | None:
    """Snapshot subdirectory the manifest points at, or None."""
    manifest = os.path.join(dim_dir, SCD2_MANIFEST)
    if not os.path.exists(manifest):
        return None
    with open(manifest) as f:
        lines = f.read().strip().splitlines()
    version = lines[0].strip() if lines else ""
    path = os.path.join(dim_dir, version)
    return path if version and os.path.exists(path) else None


def _scd2_manifest_run_id(dim_dir: str) -> str | None:
    """Streaming-query id recorded with the current version (second
    manifest line), or None for a pre-run-id manifest."""
    manifest = os.path.join(dim_dir, SCD2_MANIFEST)
    if not os.path.exists(manifest):
        return None
    with open(manifest) as f:
        lines = f.read().strip().splitlines()
    return lines[1].strip() if len(lines) > 1 else None


def _checkpoint_query_id(checkpoint_dir: str) -> str | None:
    """The stable streaming-query id Structured Streaming writes to
    ``<checkpoint>/metadata`` at start. Restarting from the same
    checkpoint preserves it; a FRESH checkpoint mints a new one —
    which is exactly the signal that batch ids have restarted at 0."""
    import json

    meta = os.path.join(checkpoint_dir, "metadata")
    try:
        with open(meta) as f:
            return json.load(f).get("id")
    except (OSError, ValueError):
        return None


def list_scd2_versions(dim_dir: str) -> list[str]:
    """Retained snapshot versions, oldest first (``v-{batch_id}``)."""
    if not os.path.isdir(dim_dir):
        return []
    versions = [n for n in os.listdir(dim_dir) if n.startswith("v-")]
    return sorted(versions, key=lambda n: int(n.split("-", 1)[1]))


def read_scd2_dim(spark, dim_dir: str, version: str | None = None) -> DataFrame:
    """Dimension snapshot read: the manifest's current version, or —
    time travel — any still-retained named version (see
    ``start_scd2_stream(keep_versions=...)``), the plain-parquet form
    of Iceberg/Delta snapshot reads."""
    if version is not None:
        path = os.path.join(dim_dir, version)
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"version {version!r} not retained under {dim_dir}; "
                f"have {list_scd2_versions(dim_dir)}"
            )
        return spark.read.parquet(path)
    path = _scd2_current_version(dim_dir)
    if path is None:
        raise FileNotFoundError(f"no SCD-2 snapshot manifest under {dim_dir}")
    return spark.read.parquet(path)


def scd2_version_diff(
    spark,
    dim_dir: str,
    v_from: str,
    v_to: str,
    key: str,
    tracked: list[str],
) -> DataFrame:
    """Change feed between two RETAINED SCD-2 snapshot versions
    (``keep_versions`` > 1 keeps the time-travel window) — what a
    table format's CDF would emit for the span, computed from plain
    snapshots via operators.relational.snapshot_diff. The history-row
    identity (business key, valid_from) is unique by the SCD-2
    invariant, so it forms the diff key (joined with an ASCII unit
    separator — content digests move through the full-outer join,
    never rows). Returns (key-as-string, valid_from, change_type):

    - 'insert' — a history row opened after ``v_from`` (new key or
      new version of an existing key),
    - 'update' — an existing row whose (tracked..., valid_to,
      is_current) changed, i.e. the version was CLOSED by a later
      update,
    - 'delete' — a history row present in ``v_from`` but missing
      from ``v_to``: an append-only dimension must NEVER produce
      this; surfacing it (rather than masking) makes the diff a
      history-rewrite integrity check when pointed backward or at a
      tampered snapshot.

    Nullable content columns (``valid_to`` is NULL on every current
    row; tracked columns may be NULL) get explicit per-column null
    markers before digesting — snapshot_diff's concat_ws skips NULLs,
    so without markers a NULL→value shift between adjacent columns
    could collide digests and mask exactly the rewrite this is meant
    to surface. The business key keeps its ORIGINAL type in the
    output: the diff joins back to the snapshots on the surrogate
    (collision-free: valid_from renders as pure digits, so the
    separator cannot be forged by a key containing it) instead of
    parsing columns out of a string."""
    from ..operators.relational import snapshot_diff

    sep = "\x1f"
    # one guaranteed-absent token per NULL: concat_ws drops NULLs, so
    # an unmarked (NULL,'x') row would digest like ('x',NULL)
    null_mark = "\x00<NULL>"
    cmp_cols = [*tracked, "valid_to", "is_current"]
    marked = [f"_m_{c}" for c in cmp_cols]

    def prep(df: DataFrame) -> DataFrame:
        out = df.withColumn(
            "_hk",
            F.concat_ws(
                sep,
                F.col(key).cast("string"),
                F.unix_micros("valid_from").cast("string"),
            ),
        )
        for c, m in zip(cmp_cols, marked):
            out = out.withColumn(
                m, F.coalesce(F.col(c).cast("string"), F.lit(null_mark))
            )
        return out

    old = prep(read_scd2_dim(spark, dim_dir, version=v_from))
    new = prep(read_scd2_dim(spark, dim_dir, version=v_to))
    d = snapshot_diff(old, new, key="_hk", compare_cols=marked)
    ids = (
        old.select("_hk", key, "valid_from")
        .unionByName(new.select("_hk", key, "valid_from"))
        .distinct()
    )
    return d.join(ids, "_hk").select(key, "valid_from", "change_type")


def start_scd2_stream(
    stream: DataFrame,
    dim_dir: str,
    checkpoint_dir: str,
    key: str,
    tracked: list[str],
    ts_col: str = "ts",
    available_now: bool = True,
    keep_versions: int = 1,
) -> StreamingQuery:
    """Streaming SCD-2 dimension maintenance: each micro-batch of
    updates merges into the dimension via operators.scd.scd2_apply.

    Snapshot layout: every batch writes the merged snapshot to a fresh
    ``v-{batch_id}`` subdirectory (reading from the previous version's
    directory, so there is no read-then-overwrite cycle and NO driver
    round-trip — the merge stays entirely on executors), then
    atomically repoints the ``_CURRENT`` manifest via os.replace and
    prunes all but the newest ``keep_versions`` snapshots (>1 keeps a
    time-travel window readable via ``read_scd2_dim(..., version=)``,
    the plain-parquet form of Iceberg/Delta snapshot retention). A
    crash before the repoint leaves the old snapshot live and intact
    (replay rewrites the same version directory); a crash AFTER the
    repoint but before the checkpoint commit replays as a no-op —
    the manifest already names ``v-{batch_id}``, so the merge result
    is in place and re-merging would read the very directory being
    overwritten. Readers resolve the manifest with
    ``read_scd2_dim``. This reproduces table-format MERGE semantics
    (Delta/Iceberg ``MERGE INTO`` + snapshot isolation) on plain
    parquet; a production deployment swaps the sink for MERGE with
    identical close-changed / open-new / pass-history semantics —
    pinned executably by tests/test_delta_merge.py where a
    delta-spark wheel exists (env-gated; the sandbox has none).
    """
    from ..operators.scd import scd2_apply

    def merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prev = _scd2_current_version(dim_dir)
        version = f"v-{batch_id}"
        run_id = _checkpoint_query_id(checkpoint_dir)
        manifest_run = _scd2_manifest_run_id(dim_dir)
        if (
            prev is not None
            and run_id is not None
            and manifest_run is not None
            and manifest_run != run_id
        ):
            # a FRESH checkpoint pointed at an existing dim_dir: batch
            # ids have restarted at 0, so the version-name replay test
            # below would silently SKIP batches carrying new data (and
            # non-colliding writes would corrupt version ordering).
            # The pairing is ambiguous by construction — fail loudly.
            raise RuntimeError(
                f"dim_dir {dim_dir!r} was built by streaming query "
                f"{manifest_run}, but checkpoint {checkpoint_dir!r} "
                f"belongs to query {run_id}. A dimension directory is "
                "bound to its original checkpoint: resume from that "
                "checkpoint, or start the new stream against a fresh "
                "dim_dir (seed it from read_scd2_dim if needed)."
            )
        if prev is not None and os.path.basename(prev) == version:
            # replay of a batch that already completed its repoint
            # (crash landed between os.replace and the checkpoint
            # commit): the snapshot IS this batch's merge result.
            # Re-merging would read v-{batch_id} while overwriting it
            # — Spark rejects that cycle and the stream would wedge;
            # the correct replay action is a no-op. (Same-run is
            # guaranteed by the query-id check above whenever both
            # ids are recoverable.)
            if manifest_run is None and run_id is not None:
                # PRE-UPGRADE manifest (no run-id line): this id
                # collision is ambiguous — a genuine post-commit
                # replay at the upgrade boundary, OR a fresh
                # checkpoint's first batch colliding with the current
                # version (most commonly batch 0 vs a dim at v-0),
                # whose data a silent no-op would permanently drop.
                # Fail loudly; both recoveries are cheap and explicit.
                raise RuntimeError(
                    f"batch {batch_id} collides with the current "
                    f"snapshot {version!r} under {dim_dir!r}, and the "
                    "manifest predates generation binding — cannot "
                    "tell a genuine crash replay from a fresh "
                    "checkpoint's restarted batch ids. If this IS the "
                    "original stream replaying, append the line "
                    f"{run_id!r} to {SCD2_MANIFEST} and restart; "
                    "otherwise start the new stream against a fresh "
                    "dim_dir (seed it from read_scd2_dim if needed)."
                )
            return
        if prev is not None and batch_id < int(
            os.path.basename(prev).split("-", 1)[1]
        ):
            # batch ids are monotonic WITHIN a generation (foreachBatch
            # is sequential and a crash replays only the newest), so a
            # LOWER id than the current snapshot proves a foreign
            # generation even when the manifest predates run-id
            # binding (no second line) — without this, a fresh
            # checkpoint's v-0 would repoint the manifest to what the
            # version sort considers the OLDEST snapshot and the
            # retention sweep could delete it immediately.
            raise RuntimeError(
                f"batch id {batch_id} is older than the current "
                f"snapshot {os.path.basename(prev)!r} under "
                f"{dim_dir!r}: batch ids have restarted, so checkpoint "
                f"{checkpoint_dir!r} is a foreign generation. Resume "
                "from the original checkpoint, or start against a "
                "fresh dim_dir (seed it from read_scd2_dim if needed)."
            )
        if prev is not None:
            dim = spark.read.parquet(prev)
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
        merged.write.mode("overwrite").parquet(os.path.join(dim_dir, version))
        tmp = os.path.join(dim_dir, SCD2_MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            # second line binds the dim_dir to this checkpoint's
            # stable query id so a fresh-checkpoint pairing is
            # detected instead of silently replay-skipped
            f.write(version if run_id is None else f"{version}\n{run_id}")
        os.replace(tmp, os.path.join(dim_dir, SCD2_MANIFEST))
        for name in list_scd2_versions(dim_dir)[: -max(1, keep_versions)]:
            # never delete the snapshot the manifest points at — the
            # final backstop against a dangling manifest no matter how
            # the version sort and the current pointer ever disagree
            if name != version:
                shutil.rmtree(os.path.join(dim_dir, name), ignore_errors=True)

    writer = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()



def _dedup_commit(
    batch_keyed, order_cols: list[str], out_dir: str, index_dir: str
) -> None:
    """Shared commit protocol for persistent-index ingest sinks
    (corpus docs, chunk store): anti-join the batch against the
    index, keep the FIRST row per fingerprint (ordered by
    ``order_cols``), write survivors to the sink BEFORE indexing
    their fingerprints — at-least-once on the sink, replay of a fully
    committed batch is a no-op, and an index READ failure propagates
    so checkpoint replay retries (the narrow empty fallback lives in
    read_index_or_empty). One definition so the two sinks cannot
    drift on the replay contract."""
    from pyspark.sql.window import Window

    from ..operators.dedup_index import (
        FINGERPRINT_COL,
        append_fingerprints,
        read_index_or_empty,
    )

    spark = batch_keyed.sparkSession
    index = read_index_or_empty(spark, index_dir)
    fresh = batch_keyed.join(
        index.select(FINGERPRINT_COL), FINGERPRINT_COL, "left_anti"
    )
    w = Window.partitionBy(FINGERPRINT_COL).orderBy(*order_cols)
    survivors = (
        fresh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    survivors.persist()
    try:
        if survivors.limit(1).count() == 0:
            return
        survivors.write.mode("append").parquet(out_dir)
        append_fingerprints(survivors, index_dir)
    finally:
        survivors.unpersist()


def start_corpus_ingest_stream(
    docs_stream: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming corpus ingestion: stateless quality/lang gates on the
    stream (streaming.corpus_quality_gates — q67's expressions), then
    each micro-batch exact-dedups against the PERSISTENT fingerprint
    index (operators.dedup_index) before appending survivors.

    The index IS the dedup state: cross-batch and cross-RESTART
    duplicates drop without any in-stream state store, and state size
    is 16 bytes per kept document ever (not per watermark window —
    this is the unbounded-horizon complement of
    dropDuplicatesWithinWatermark). Replay safety: survivors are
    written to the sink BEFORE their fingerprints are indexed, so a
    replayed batch re-emits at most the rows whose digests missed the
    index write (at-least-once on the sink, never data loss); a fully
    committed batch replays as a no-op because every fingerprint
    already hits the index.
    """
    from ..operators.dedup_index import FINGERPRINT_COL
    from . import corpus_quality_gates

    gated = corpus_quality_gates(docs_stream)

    def ingest(batch: DataFrame, batch_id: int) -> None:
        fp = batch.withColumnRenamed("fp", FINGERPRINT_COL)
        _dedup_commit(fp, ["doc_id"], out_dir, index_dir)

    writer = (
        gated.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_chunk_ingest_stream(
    docs_stream: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    window: int = 30,
    stride: int = 20,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming chunk-store ingestion: stateless stride chunking
    (operators.chunking.stride_chunks — q107's operator) on each
    micro-batch, then chunk CONTENT dedup against the persistent
    fingerprint index before appending (doc_id, chunk_idx,
    chunk_hash, chunk_text) — the continuously-fed store a
    RAG/pretraining pipeline reads.

    Same contract as start_corpus_ingest_stream: the index is the
    dedup state (16 bytes per kept chunk ever, no in-stream state
    store, unbounded horizon), survivors are written to the sink
    BEFORE their hashes are indexed (at-least-once, replay of a fully
    committed batch is a no-op), and an index read failure on a later
    batch fails the batch so checkpoint replay retries.
    """
    from ..operators.chunking import stride_chunks
    from ..operators.dedup_index import FINGERPRINT_COL

    def ingest(batch: DataFrame, batch_id: int) -> None:
        chunks = stride_chunks(
            batch.select("doc_id", F.split("text", " ").alias("t")),
            "doc_id",
            "t",
            window,
            stride,
        ).select(
            "doc_id",
            "chunk_idx",
            F.concat_ws(" ", "chunk").alias("chunk_text"),
        )
        keyed = chunks.withColumn(FINGERPRINT_COL, F.md5("chunk_text"))
        _dedup_commit(keyed, ["doc_id", "chunk_idx"], out_dir, index_dir)

    writer = (
        docs_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_rollup_stream(
    events_stream: DataFrame,
    partials_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incrementally maintained daily rollup (the streaming side of
    q57's continuous-aggregate story): each micro-batch writes its
    per-(event_type, day) partial aggregate into a batch_id-keyed
    partition, and ``read_rollup`` re-aggregates the partials.

    Exactly-once WITHOUT a state store: a replayed batch dynamically
    OVERWRITES its own batch_id partition with identical content (no
    double counting), and partial sums are exact decimals, so
    re-aggregation is associative — the rollup read always equals the
    batch recompute over everything ingested. Partials are
    dimension-sized (days × types per batch), so the compaction read
    is trivially cheap at any corpus scale; compact old partials into
    a base partition offline if batch count ever matters.
    """

    def write_partial(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():  # a 0-row write creates a schema-less dir
            return
        # per-writer dynamic overwrite: the session-global conf
        # save/set/restore raced between concurrent streams on one
        # SparkSession — a lost race ran the overwrite in STATIC mode
        # and wiped every previously landed batch partition
        (
            batch.groupBy(
                F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(27,4)")).alias("sum_value"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(partials_dir)
        )

    writer = (
        events_stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(spark, partials_dir: str) -> DataFrame:
    """The rollup view: re-aggregate the per-batch partials (exact
    decimal sums — associative, so partial-of-partials equals the
    direct aggregate)."""
    return (
        spark.read.parquet(partials_dir)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_value").cast("double").alias("sum_value"),
        )
    )


def start_trending_stream(
    events_stream: DataFrame,
    partials_dir: str,
    checkpoint_dir: str,
    half_life_days: float = 1.0,
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental twin of q145's exponential time-decay trending
    score (rescale-and-add update algebra, made replay-safe with the
    rollup/health partials pattern instead of a mutable state table).

    Each micro-batch writes a per-user partial keyed to the BATCH'S
    OWN time anchor: (user_id, n_events, decayed_sum, anchor_us) with
    ``decayed_sum = Σ 2^((ts − anchor_us)/h)`` over the batch's events
    and ``anchor_us`` the batch max event time. ``read_trending``
    rescales every partial to the global anchor T = max(anchor_us) —
    multiply by ``2^(−(T − anchor_b)/h)`` — and sums: exactly the
    ``S·2^(−Δ/h) + new`` update q145 documents, but expressed as an
    associative merge over immutable partials, so

    - a replayed batch dynamically overwrites its own batch_id
      partition with identical content (exactly-once, no state store,
      no double counting — same contract as start_rollup_stream), and
    - every exponent is ≤ 0 (ts ≤ anchor_b ≤ T), so the stream can run
      for unbounded wall-clock without overflow — unlike the naive
      fixed-epoch up-weighting 2^(ts/h), which overflows doubles after
      ~10³ half-lives.

    Partials are |users-per-batch| rows; compact old partials into a
    single rebased partial offline if batch count ever matters (the
    rescale-and-add algebra makes that a one-liner).
    Ages are integer microseconds (the q126/q145 discipline) and
    in-batch weights round to 8 before the exact-decimal partial sum,
    mirroring q145's determinism rules.
    """
    h_us = float(half_life_days) * 86400000000.0

    def write_partial(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():  # no anchor derivable; nothing to land
            return
        _guard_run_generation(
            partials_dir,
            checkpoint_dir,
            os.path.join(partials_dir, TRENDING_BASE_MANIFEST),
        )
        anchor = batch.agg(F.max(F.unix_micros("ts")).alias("anchor_us"))
        (
            batch.crossJoin(F.broadcast(anchor))
            .select(
                "user_id",
                "anchor_us",
                F.round(
                    F.pow(
                        0.5,
                        (F.col("anchor_us") - F.unix_micros("ts"))
                        / F.lit(h_us),
                    ),
                    8,
                ).alias("wt"),
            )
            .groupBy("user_id", "anchor_us")
            .agg(
                F.count("*").alias("n_events"),
                # pin the stored width: sum(decimal(27,8)) infers
                # decimal(37,8), which would schema-clash with the
                # compacted base partition's re-sum
                F.sum(F.col("wt").cast("decimal(27,8)"))
                .cast("decimal(38,8)")
                .alias("decayed_sum"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(partials_dir)
        )

    writer = (
        events_stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


TRENDING_BASE_MANIFEST = "_BASE"
IVF_BASE_MANIFEST = "_IVF_BASE"
IVF_STREAM_DIR = "assigned_stream"
PQ_BASE_MANIFEST = "_PQ_BASE"
PQ_STREAM_DIR = "codes_stream"
RUN_SIDECAR = "_RUN"


def _fold_manifest_state(
    manifest_path: str,
) -> tuple[int | None, set, str | None]:
    """(base version, folded batch ids, owning streaming-query id)
    from an atomic compaction manifest, or (None, ∅, None) before any
    compaction. The run id is the query generation whose batch-id
    numbering the folded ids belong to."""
    import json

    if not os.path.exists(manifest_path):
        return None, set(), None
    with open(manifest_path) as f:
        meta = json.load(f)
    return (
        int(meta["version"]),
        {int(i) for i in meta["folded"]},
        meta.get("run_id"),
    )


def _flip_fold_manifest(
    manifest_path: str, version: int, folded: list, run_id: str | None
) -> None:
    """Commit a compaction in ONE atomic rename — the only moment the
    new base becomes visible and the folded ids become excluded."""
    import json

    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"version": version, "folded": sorted(folded), "run_id": run_id},
            f,
        )
    os.replace(tmp, manifest_path)


def _run_sidecar_id(state_dir: str) -> str | None:
    sidecar = os.path.join(state_dir, RUN_SIDECAR)
    if not os.path.exists(sidecar):
        return None
    with open(sidecar) as f:
        return f.read().strip() or None


def _guard_run_generation(
    state_dir: str, checkpoint_dir: str, manifest_path: str
) -> None:
    """Folded batch ids are only meaningful WITHIN the checkpoint
    generation that numbered them — a FRESH checkpoint restarts ids
    at 0, so its batches would collide with folded ids and be
    silently excluded (permanent data loss if the source changed).
    Called from every micro-batch write: records the current
    streaming-query id in a ``_RUN`` sidecar, and fails LOUDLY when a
    different generation tries to write into a dir whose manifest
    already folded ids under an older generation. Recovery: restore
    the original checkpoint, or replay the source into a fresh
    dir. Pre-compaction generation changes stay allowed — without
    exclusions, a re-landed batch id just overwrites its partition,
    which is content-identical for a stable source (a generation swap
    over a CHANGED source pre-compaction is the operator's call; see
    docs/streaming.md)."""
    qid = _checkpoint_query_id(checkpoint_dir)
    if qid is None:
        return
    version, folded, run_id = _fold_manifest_state(manifest_path)
    if folded and run_id and qid != run_id:
        raise RuntimeError(
            f"{state_dir} was compacted under streaming-query id "
            f"{run_id}; checkpoint {checkpoint_dir} is a different "
            f"generation ({qid}) whose batch ids would collide with "
            "folded ids and be silently excluded. Restore the original "
            "checkpoint, or replay the source into a fresh directory."
        )
    if folded and run_id is None:
        # pre-upgrade manifest (folds recorded before generation
        # binding existed): the first writer after upgrade ADOPTS the
        # binding atomically, so every LATER foreign generation is
        # rejected — narrows the unprotectable window to this one
        # transition
        _flip_fold_manifest(manifest_path, version, sorted(folded), qid)
    sidecar = os.path.join(state_dir, RUN_SIDECAR)
    if _run_sidecar_id(state_dir) != qid:
        os.makedirs(state_dir, exist_ok=True)
        tmp = sidecar + ".tmp"
        with open(tmp, "w") as f:
            f.write(qid)
        os.replace(tmp, sidecar)


def _trending_base_state(partials_dir: str) -> tuple[int | None, set]:
    version, folded, _run = _fold_manifest_state(
        os.path.join(partials_dir, TRENDING_BASE_MANIFEST)
    )
    return version, folded


def _sweep_versioned_base(
    root: str,
    leaf_glob: str,
    base_prefix: str,
    plain_base: str | None,
    folded: set,
    keep_version: int | None,
) -> None:
    """The ONE sweep every versioned-base compaction uses (trending /
    IVF / PQ): folded stream leaves, every base version except
    ``keep_version``, and — once a fold exists — the superseded plain
    base dir (``None`` for layouts without one). Removal is always
    safe: everything removed is already excluded by manifest-resolving
    readers. Runs before AND after each flip so a crash between flip
    and cleanup is repaired by the next run."""
    for d in glob.glob(os.path.join(root, leaf_glob)):
        if int(d.rsplit("batch_id=", 1)[1]) in folded:
            shutil.rmtree(d, ignore_errors=True)
    for d in glob.glob(os.path.join(root, base_prefix + "*")):
        if keep_version is None or d != os.path.join(
            root, f"{base_prefix}{keep_version}"
        ):
            shutil.rmtree(d, ignore_errors=True)
    if plain_base is not None and keep_version is not None:
        shutil.rmtree(os.path.join(root, plain_base), ignore_errors=True)


def _sweep_trending(
    partials_dir: str, folded: set, keep_version: int | None
) -> None:
    _sweep_versioned_base(
        partials_dir, "batch_id=*", "_base-v", None, folded, keep_version
    )


def _sweep_ivf(
    index_path: str, folded: set, keep_version: int | None
) -> None:
    _sweep_versioned_base(
        index_path,
        os.path.join(IVF_STREAM_DIR, "cell=*", "batch_id=*"),
        "assigned-v",
        "assigned",
        folded,
        keep_version,
    )


def _compact_stream_base(
    spark,
    root: str,
    *,
    manifest_name: str,
    stream_dir_name: str,
    leaf_pattern: str,
    base_prefix: str,
    plain_base: str,
    id_col: str,
    sidecar_dir: str,
    partition_by: tuple = (),
    keep_generation: bool = False,
) -> tuple[int, int | None]:
    """The crash-safe versioned-base compaction core shared by the
    IVF and PQ index maintainers (trending shares the sweep/manifest
    machinery but folds with rescale algebra, so it keeps its own
    fold body): pre-sweep, NEWEST batch never folds (its crash-replay
    window), global latest-wins rewrite into ``{base_prefix}{n}``,
    ONE atomic manifest flip binding folded ids to the owning
    streaming-query generation (prev binding never silently rebound),
    post-sweep. One copy of the discipline — a crash-safety fix lands
    everywhere at once. Returns (batches folded, new version or
    None)."""
    manifest = os.path.join(root, manifest_name)
    version, folded, prev_run = _fold_manifest_state(manifest)
    leaf_glob = os.path.join(stream_dir_name, leaf_pattern)

    def sweep(f: set, keep: int | None) -> None:
        _sweep_versioned_base(
            root, leaf_glob, base_prefix, plain_base, f, keep
        )

    # sweep leftovers of any earlier crash between flip and cleanup
    # FIRST (every invocation, not only folding ones)
    sweep(folded, version)
    stream_dir = os.path.join(root, stream_dir_name)
    leaves = glob.glob(os.path.join(root, leaf_glob))
    ids = {int(d.rsplit("batch_id=", 1)[1]) for d in leaves}
    live = sorted(ids - folded)
    if len(live) < 2:  # newest never folds; nothing else to fold
        return 0, version
    foldable = live[:-1]
    base_dir = os.path.join(
        root, plain_base if version is None else f"{base_prefix}{version}"
    )
    # preserve EVERY column (vector/codes + any metadata) — a fixed
    # projection here would silently strip columns at the first fold
    parts = []
    if _has_committed_files(base_dir):
        parts.append(
            spark.read.parquet(base_dir).withColumn(
                "_bid", F.lit(-1).cast("long")
            )
        )
    parts.append(
        spark.read.parquet(stream_dir)
        .filter(F.col("batch_id").isin(foldable))
        .withColumn("_bid", F.col("batch_id").cast("long"))
        .drop("batch_id")
    )
    new_version = 0 if version is None else version + 1
    writer = _merge_latest_wins(
        parts, id_col, keep_generation=keep_generation
    ).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(root, f"{base_prefix}{new_version}"))
    all_folded = sorted(folded | set(foldable))
    _flip_fold_manifest(
        manifest,
        new_version,
        all_folded,
        prev_run or _run_sidecar_id(sidecar_dir),
    )
    # best-effort cleanup AFTER the flip (leftovers are excluded by
    # readers; the pre-sweep above repairs a crash here next run)
    sweep(set(all_folded), new_version)
    return len(foldable), new_version


def compact_trending_partials(
    spark, partials_dir: str, half_life_days: float = 1.0
) -> int:
    """Offline compaction for the trending sink: fold all FINALIZED
    per-batch partials into one base partial rebased onto their
    newest anchor, so partials count stays O(1) across stream
    lifetime. Returns the number of batch partitions folded.

    Crash-safe via a versioned base + one atomic manifest flip: the
    base lives in ``_base-v{n}`` (underscore prefix — invisible to
    the partitioned batch read) and the ``_BASE`` manifest records
    (version, folded batch ids) in a single os.replace. Readers
    resolve the manifest and EXCLUDE folded batch ids even if their
    directories still exist, so every crash window is consistent: a
    crash before the flip leaves the old view live (the new base dir
    is an ignored orphan, overwritten next run); a crash after the
    flip leaves undeleted folded partitions that readers already
    ignore (cleanup retries next run). Folded ids are bound to the
    checkpoint generation that numbered them (run id recorded in the
    manifest): a FRESH checkpoint restarts batch ids at 0, and its
    batches colliding with folded ids would be silently excluded —
    so the sink's write path fails loudly on that pairing
    (_guard_run_generation) instead of losing data.

    The NEWEST batch id never folds — after a crash between its write
    and the checkpoint commit, that batch replays and overwrites its
    own partition; every older batch is checkpoint-committed by the
    time a newer one exists (foreachBatch is sequential).
    """
    h_us = float(half_life_days) * 86400000000.0
    version, folded, prev_run = _fold_manifest_state(
        os.path.join(partials_dir, TRENDING_BASE_MANIFEST)
    )
    # sweep leftovers of any earlier crash between flip and cleanup
    # FIRST (every invocation, not only folding ones)
    _sweep_trending(partials_dir, folded, version)
    p = spark.read.parquet(partials_dir)
    ids = {
        int(r["batch_id"])
        for r in p.select("batch_id").distinct().collect()
    }
    live = sorted(ids - folded)
    if not live:
        return 0
    foldable = live[:-1]  # newest stays (crash-replay window)
    if not foldable or (version is None and len(foldable) < 2):
        return 0  # nothing to gain yet
    parts = [
        p.filter(F.col("batch_id").isin(foldable)).select(
            "user_id", "anchor_us", "n_events", "decayed_sum"
        )
    ]
    if version is not None:
        parts.append(
            spark.read.parquet(
                os.path.join(partials_dir, f"_base-v{version}")
            )
        )
    src = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    anchor = src.agg(F.max("anchor_us").alias("t_us"))
    new_version = 0 if version is None else version + 1
    (
        src.crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            "n_events",
            F.col("t_us").alias("new_anchor"),
            # round each rescaled per-partial term BEFORE the sum and
            # sum exact decimals (q145's round-then-decimal-sum rule):
            # an IEEE double sum is partition-order-dependent in its
            # last ulp, which could flip the stored 8th decimal
            F.round(
                F.col("decayed_sum").cast("double")
                * F.pow(
                    0.5, (F.col("t_us") - F.col("anchor_us")) / F.lit(h_us)
                ),
                8,
            )
            .cast("decimal(27,8)")
            .alias("s"),
        )
        .groupBy("user_id", F.col("new_anchor").alias("anchor_us"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("s").cast("decimal(38,8)").alias("decayed_sum"),
        )
        .select("user_id", "anchor_us", "n_events", "decayed_sum")
        .write.mode("overwrite")
        .parquet(os.path.join(partials_dir, f"_base-v{new_version}"))
    )
    all_folded = sorted(folded | set(foldable))
    # bind the folded ids to the generation that numbered them:
    # manifest binding first (established bindings are never silently
    # rebound), sidecar for the first-ever fold
    _flip_fold_manifest(
        os.path.join(partials_dir, TRENDING_BASE_MANIFEST),
        new_version,
        all_folded,
        prev_run or _run_sidecar_id(partials_dir),
    )
    # best-effort cleanup AFTER the flip (leftovers are excluded by
    # readers; the pre-sweep above repairs a crash here next run)
    _sweep_trending(partials_dir, set(all_folded), new_version)
    return len(foldable)


def start_vector_ingest_stream(
    vectors_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming ingest into a TRAINED IVF vector index (standard IVF
    practice: the coarse quantizer trains once batch-side on a sample
    — operators.similarity.build_ivf_index + save_ivf_index — and all
    later vectors are ASSIGNED, never re-trained).

    Each micro-batch computes the exact nearest centroid per vector
    (squared-L2 argmin over the broadcast nlist-row centroid table —
    the same metric KMeans assignment uses, lowest-cell tiebreak) and
    lands the batch under ``assigned_stream/cell=…/batch_id=…``:
    cell-first partitioning keeps probe reads directory-pruned
    exactly like the batch layout, and the batch_id leaf gives the
    rollup-sink exactly-once contract (a replayed batch dynamically
    overwrites its own leaves with identical content). Searches run
    against ``read_streaming_ivf``, which merges the batch-built
    vectors with everything streamed so far."""

    def ingest(batch: DataFrame, batch_id: int) -> None:
        import json

        if batch.isEmpty():
            return
        _guard_run_generation(
            index_path,
            checkpoint_dir,
            os.path.join(index_path, IVF_BASE_MANIFEST),
        )
        spark = batch.sparkSession
        # the index's column contract (recorded at save time) decides
        # what lands: batches project to EXACTLY these columns, so
        # base and stream leaves can never drift apart schema-wise.
        # A pre-upgrade meta without the contract keeps the original
        # (id, vector)-only projection.
        with open(os.path.join(index_path, "meta.json")) as f:
            meta = json.load(f)
        cols = meta.get("columns") or [id_col, vec_col]
        missing = [c for c in cols if c not in batch.columns]
        if missing:
            raise ValueError(
                f"vector stream batch lacks index columns {missing}; "
                f"the index at {index_path} requires {cols}"
            )
        cent = spark.read.parquet(os.path.join(index_path, "centroids"))
        d2 = F.aggregate(
            F.zip_with(
                F.col(vec_col), F.col("centroid"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # carry the contract's non-id columns (vector + metadata) so
        # the merged index serves filtered search (ivf_search where=)
        # against streamed rows too; extra stream columns are dropped
        extra = [c for c in cols if c != id_col]
        (
            batch.select(*cols)
            .crossJoin(F.broadcast(cent))
            .withColumn("_d2", d2)
            .groupBy(id_col)
            .agg(
                F.min(F.struct(F.col("_d2"), F.col("cell"))).alias("_m"),
                *[F.any_value(c).alias(c) for c in extra],
            )
            .select(id_col, *extra, F.col("_m.cell").alias("cell"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cell", "batch_id")
            .parquet(os.path.join(index_path, IVF_STREAM_DIR))
        )

    writer = (
        vectors_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_streaming_ivf(spark, index_path: str):
    """The live IVF index: batch-built vectors (if any) merged with
    everything streamed so far. The merged ``assigned`` carries a
    ``_bid`` version column (-1 for the batch build, the micro-batch
    id for streamed rows); ``ivf_search`` resolves duplicates of a
    re-ingested vec_id LATEST-WINS *after* its cell filter, so probe
    reads stay directory-pruned on the cell partition column in BOTH
    layouts. Caveat (documented, bounded): an UPDATED embedding that
    lands in a different cell leaves the superseded row in the old
    cell until the index is compacted (re-save the merged index via
    save_ivf_index) — a probe of only the old cell can surface the
    stale version; same-cell updates (including exact re-ingest, the
    common replay case) resolve exactly — and compact_streaming_ivf
    REMOVES cross-cell stale rows entirely by folding streamed batches
    into a rewritten cell-partitioned base (resolved here via the
    ``_IVF_BASE`` manifest: folded batch ids are excluded even if
    their leaves still exist after a cleanup crash; a fresh-checkpoint
    generation colliding with folded ids is rejected at the write
    path — _guard_run_generation)."""
    import json

    from ..operators.similarity import IVFIndex

    with open(os.path.join(index_path, "meta.json")) as f:
        meta = json.load(f)
    version, folded, _run = _fold_manifest_state(
        os.path.join(index_path, IVF_BASE_MANIFEST)
    )
    parts = []
    batch_dir = os.path.join(
        index_path,
        "assigned" if version is None else f"assigned-v{version}",
    )
    if _has_committed_files(batch_dir):
        parts.append(
            spark.read.parquet(batch_dir).withColumn(
                "_bid", F.lit(-1).cast("long")
            )
        )
    stream_dir = os.path.join(index_path, IVF_STREAM_DIR)
    # glob for batch_id leaves: after a full compaction the cell=…
    # shells may remain with every leaf folded away, and a bare
    # directory read would fail schema inference
    if glob.glob(os.path.join(stream_dir, "cell=*", "batch_id=*")):
        s = spark.read.parquet(stream_dir)
        if folded:
            s = s.filter(~F.col("batch_id").isin(sorted(folded)))
        parts.append(
            s.withColumn("_bid", F.col("batch_id").cast("long")).drop(
                "batch_id"
            )
        )
    if not parts:
        raise FileNotFoundError(f"no vectors under {index_path}")
    assigned = parts[0]
    for p in parts[1:]:
        assigned = assigned.unionByName(p)
    # resolve the id/vector columns from the recorded column contract
    # (columns[0]/[1]) so ivf_search's latest-wins window dedups a
    # custom-id index too; pre-upgrade meta keeps the defaults
    cols = meta.get("columns") or ["vec_id", "embedding"]
    return IVFIndex(
        assigned=assigned,
        centroids=spark.read.parquet(os.path.join(index_path, "centroids")),
        nlist=int(meta["nlist"]),
        id_col=cols[0],
        vec_col=cols[1],
        cell_stats=meta.get("cell_stats"),
    )


def compact_streaming_ivf(
    spark,
    index_path: str,
    id_col: str | None = None,
) -> int:
    """Fold finalized streamed batches into a rewritten
    cell-partitioned base, resolving latest-wins per vec_id GLOBALLY
    — this removes the one read-path caveat: a cross-cell embedding
    update's superseded row in its old cell, which a narrow probe of
    only that cell could otherwise surface. Returns the number of
    stream batches folded.

    Same crash-safe discipline as compact_trending_partials: the new
    base lands in ``assigned-v{n}``, commits via one atomic
    ``_IVF_BASE`` manifest flip (readers exclude folded batch ids
    even if their leaves still exist after a cleanup crash — the
    old-version row of a cross-cell update must never resurrect), the
    folded ids are bound to the checkpoint generation that numbered
    them (a fresh checkpoint colliding with them is rejected at the
    write path), and the NEWEST stream batch never folds (its
    crash-replay window: a batch that missed its checkpoint commit
    replays and overwrites its own leaves). Cleanup of folded leaves,
    every stale base version, and the superseded plain batch dir runs
    AFTER the flip, best-effort, retried on the next compaction.

    Cost: one full shuffle of the index on the id column (the
    latest-wins window) + one cell-partitioned rewrite — the standard
    periodic LSM-style compaction trade; probe reads between
    compactions pay only the per-cell window in ivf_search.

    ``id_col`` defaults to the index's recorded column contract
    (meta.json columns[0]) — pass it only to override a pre-upgrade
    meta that never recorded one."""
    import json

    if id_col is None:
        with open(os.path.join(index_path, "meta.json")) as f:
            cols = json.load(f).get("columns")
        id_col = cols[0] if cols else "vec_id"
    folded_n, new_version = _compact_stream_base(
        spark,
        index_path,
        manifest_name=IVF_BASE_MANIFEST,
        stream_dir_name=IVF_STREAM_DIR,
        leaf_pattern=os.path.join("cell=*", "batch_id=*"),
        base_prefix="assigned-v",
        plain_base="assigned",
        id_col=id_col,
        sidecar_dir=index_path,
        partition_by=("cell",),
    )
    if not folded_n:
        return 0
    # refresh the selectivity stats over the rewritten base so
    # auto-nprobe estimates track the folded state (advisory — a
    # crash before this leaves the previous estimate, never a wrong
    # result); atomic rewrite preserving every other meta key
    from ..operators.similarity import compute_cell_stats

    with open(os.path.join(index_path, "meta.json")) as f:
        meta = json.load(f)
    cols = meta.get("columns") or [id_col, "embedding"]
    meta["cell_stats"] = compute_cell_stats(
        spark.read.parquet(
            os.path.join(index_path, f"assigned-v{new_version}")
        ),
        cols[0],
        cols[1],
    )
    tmp = os.path.join(index_path, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_path, "meta.json"))
    return folded_n


def start_pq_ingest_stream(
    vectors_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str | None = None,
    vec_col: str = "embedding",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming encode into a TRAINED product-quantization index
    (operators.similarity.build_pq_index + save_pq_index): the
    codebooks train once batch-side — standard PQ practice — and each
    micro-batch encodes its vectors with the SAME codebooks via pure
    column expressions (similarity.pq_encode_columns: exact
    squared-L2 argmin per subspace, parity with KMeans.transform
    pinned in tests), landing m code ids per vector under
    ``codes_stream/batch_id=…`` with the rollup-sink exactly-once
    contract. Duplicate vec_ids WITHIN a batch collapse to one row
    before encoding (the IVF ingest's invariant) so the cross-batch
    latest-wins in ``read_streaming_pq`` never ties on _bid.

    A same-generation replayed batch id just overwrites its partition
    (or, once folded into the ``_PQ_BASE`` compaction manifest by
    compact_streaming_pq, is excluded by the reader — the fold is its
    committed content). Cross-batch latest-wins ordering, however, is
    only meaningful within one checkpoint generation — a FRESH
    checkpoint may re-batch the source differently, leaving a stale
    copy of an updated vector in a higher-numbered partition that
    silently wins (and colliding with folded ids would silently DROP
    its batches) — so the write path is generation-BOUND
    (_guard_pq_generation, the SCD2/IVF contract): the first batch
    records the owning streaming-query id in ``codes_stream/_RUN``
    and any later foreign generation is rejected loudly. To re-ingest
    under a new generation, use a fresh index dir (or restore the
    original checkpoint). ``id_col=None`` resolves the id column
    recorded in meta.json at save time.

    A RESIDUAL (IVFPQ) index — meta.json records coarse
    ``centroids`` (save_ivfpq_index) — ingests through the SAME sink:
    each batch additionally assigns its coarse cell and encodes the
    residual through the frame-based codegen encoder
    (similarity.ivfpq_encode_frame — the column-expression twin costs
    minutes of Catalyst analysis at production ksub, SCALING.md's
    500x finding), landing (id, cell, codes) rows in the same
    batch_id leaves."""

    def ingest(batch: DataFrame, batch_id: int) -> None:
        import json

        if batch.isEmpty():
            return
        _guard_pq_generation(index_path, checkpoint_dir)
        from ..operators.similarity import (
            ivfpq_encode_frame,
            pq_encode_frame,
        )

        with open(os.path.join(index_path, "meta.json")) as f:
            meta = json.load(f)
        key = id_col or meta.get("id_col", "vec_id")
        extras: list = []
        if "centroids" in meta:  # residual (IVFPQ) layout
            # the recorded column contract carries keep_cols metadata
            # (filtered-search columns) through streamed rows too —
            # the IVF sink's schema-parity rule
            extras = [
                c for c in meta.get("columns", [key]) if c != key
            ]
            missing = [
                c for c in (key, vec_col, *extras) if c not in batch.columns
            ]
            if missing:
                raise ValueError(
                    f"vector stream batch lacks index columns {missing}; "
                    f"the index at {index_path} requires "
                    f"{[key, vec_col, *extras]}"
                )
        # one any_value over a STRUCT of every carried column, then
        # expanded — per-column any_value could compose a torn row from
        # two duplicate records (the vector from one, keep_cols
        # metadata from another), binding codes to metadata that never
        # co-occurred (ADVICE r08)
        rec = F.any_value(F.struct(vec_col, *extras)).alias("_rec")
        uniq = (
            batch.groupBy(key)
            .agg(rec)
            .select(key, f"_rec.{vec_col}", *[f"_rec.{c}" for c in extras])
        )
        # frame-based encoders (exploded + broadcast codebook rows,
        # whole-stage codegen) — the column-expression encoders stop
        # analyzing/executing viably at production ksub (measured;
        # see ivfpq_encode_frame)
        if "centroids" in meta:
            encoded = ivfpq_encode_frame(
                uniq,
                meta["centroids"],
                meta["codebooks"],
                id_col=key,
                vec_col=vec_col,
                extra_cols=tuple(extras),
            )
        else:
            encoded = pq_encode_frame(
                uniq, meta["codebooks"], id_col=key, vec_col=vec_col
            )
        (
            encoded.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(os.path.join(index_path, PQ_STREAM_DIR))
        )

    writer = (
        vectors_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _guard_pq_generation(index_path: str, checkpoint_dir: str) -> None:
    """read_streaming_pq resolves a re-ingested vec_id LATEST-WINS by
    batch id, and batch ids are only ordered WITHIN one checkpoint
    generation — a fresh checkpoint restarts numbering, so a stale
    copy of an updated vector could land in a higher-numbered
    partition and silently win. _guard_run_generation's mirror for
    the PQ layout: the first write records the owning streaming-query
    id in a ``codes_stream/_RUN`` sidecar; a different generation is
    rejected at the write path once ANY cross-batch state exists —
    live stream partitions, OR ids already folded into the
    ``_PQ_BASE`` compaction manifest (a foreign generation's
    restarted batches would collide with folded ids and be silently
    EXCLUDED by the reader — permanent data loss, the exact case
    _guard_run_generation rejects unconditionally). Recovery: restore
    the original checkpoint, or re-ingest into a fresh index dir.
    Pre-upgrade state (partitions but no sidecar) is adopted by the
    first guarded writer — the same one-transition window as the
    fold-manifest upgrade path."""
    qid = _checkpoint_query_id(checkpoint_dir)
    if qid is None:
        return
    stream_dir = os.path.join(index_path, PQ_STREAM_DIR)
    _, folded, manifest_run = _fold_manifest_state(
        os.path.join(index_path, PQ_BASE_MANIFEST)
    )
    # the sidecar is the primary binding; the compaction manifest's
    # recorded run id backs it up if the sidecar ever goes missing
    # (e.g. the stream dir was cleared after a full fold)
    owner = _run_sidecar_id(stream_dir) or manifest_run
    if (
        owner is not None
        and owner != qid
        and (folded or glob.glob(os.path.join(stream_dir, "batch_id=*")))
    ):
        raise RuntimeError(
            f"{stream_dir} was ingested under streaming-query id "
            f"{owner}; checkpoint {checkpoint_dir} is a different "
            f"generation ({qid}) whose restarted batch ids would "
            "corrupt the cross-batch latest-wins order (or collide "
            "with manifest-folded ids and be silently excluded). "
            "Restore the original checkpoint, or re-ingest into a "
            "fresh index dir."
        )
    if owner != qid:
        os.makedirs(stream_dir, exist_ok=True)
        sidecar = os.path.join(stream_dir, RUN_SIDECAR)
        tmp = sidecar + ".tmp"
        with open(tmp, "w") as f:
            f.write(qid)
        os.replace(tmp, sidecar)


def _merge_latest_wins(
    parts: list, id_col: str, keep_generation: bool = False
) -> DataFrame:
    """Union parts that each carry a ``_bid`` version column and keep
    each id's highest-_bid state — the one latest-wins resolution
    shared by read_streaming_pq and compact_streaming_ivf (and
    applied per-probe inside ivf_search for the IVF read path).

    ``keep_generation=False`` (vectors/codes: one row per id per
    generation) keeps exactly one row per id. ``keep_generation=True``
    (row-SET state like BM25 postings: one row per (doc, term))
    keeps ALL rows whose _bid equals the id's max — the id's newest
    generation as a set."""
    from pyspark.sql.window import Window

    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    if keep_generation:
        w = Window.partitionBy(id_col)
        return (
            df.withColumn("_mx", F.max("_bid").over(w))
            .filter(F.col("_bid") == F.col("_mx"))
            .drop("_mx", "_bid")
        )
    w = Window.partitionBy(id_col).orderBy(F.desc("_bid"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_bid")
    )


def read_streaming_pq(spark, index_path: str, id_col: str | None = None):
    """The live PQ index: batch-encoded codes (if any) merged with
    everything streamed so far, duplicates of a re-ingested vec_id
    resolved LATEST-WINS (the stream wins over the batch build, newer
    batches win over older). The resolved codes feed pq_adc_search /
    pq_search_refined unchanged — ADC scans the whole codes table, so
    unlike the IVF layout there is no pruning structure to preserve
    and resolution happens eagerly here. ``id_col=None`` resolves the
    id column recorded in meta.json at save time (it must match the
    one the ingest sink landed).

    A residual layout (meta records coarse ``centroids``) returns an
    IVFPQIndex instead, and — the read_streaming_ivf discipline —
    resolution is DEFERRED: the merged codes keep their ``_bid``
    version column and ivfpq_adc_search resolves latest-wins AFTER
    its cell filter, so probe reads stay directory-pruned on the
    cell-partitioned base instead of paying a full-table id-window
    per search. Same bounded caveat as the IVF layout: an updated
    vector that lands in a DIFFERENT cell leaves its superseded row
    in the old cell until compact_streaming_pq folds it away."""
    import json

    from ..operators.similarity import IVFPQIndex, PQIndex

    with open(os.path.join(index_path, "meta.json")) as f:
        meta = json.load(f)
    if id_col is None:
        id_col = meta.get("id_col", "vec_id")
    version, folded, _run = _fold_manifest_state(
        os.path.join(index_path, PQ_BASE_MANIFEST)
    )
    parts = []
    codes_dir = os.path.join(
        index_path, "codes" if version is None else f"codes-v{version}"
    )
    if _has_committed_files(codes_dir):
        parts.append(
            spark.read.parquet(codes_dir).withColumn(
                "_bid", F.lit(-1).cast("long")
            )
        )
    stream_dir = os.path.join(index_path, PQ_STREAM_DIR)
    if glob.glob(os.path.join(stream_dir, "batch_id=*")):
        s = spark.read.parquet(stream_dir)
        if folded:  # folded ids live in the versioned base; their
            # partitions may still exist after a cleanup crash
            s = s.filter(~F.col("batch_id").isin(sorted(folded)))
        parts.append(
            s.withColumn("_bid", F.col("batch_id").cast("long")).drop(
                "batch_id"
            )
        )
    if not parts:
        raise FileNotFoundError(f"no codes under {index_path}")
    if "centroids" in meta:
        # deferred resolution: keep _bid, let the search resolve
        # after its cell filter (pruning-preserving, see docstring)
        codes = parts[0]
        for p in parts[1:]:
            codes = codes.unionByName(p)
        return IVFPQIndex(
            codes=codes,
            centroids=meta["centroids"],
            codebooks=meta["codebooks"],
            nlist=int(meta["nlist"]),
            m=int(meta["m"]),
            ksub=int(meta["ksub"]),
            dsub=int(meta["dsub"]),
            id_col=id_col,
            # streamed-but-uncompacted rows are not in the stats —
            # the estimate tracks the last save, the IVF contract
            cell_stats=meta.get("cell_stats"),
        )
    codes = _merge_latest_wins(parts, id_col)
    return PQIndex(
        codes=codes,
        codebooks=meta["codebooks"],
        m=int(meta["m"]),
        ksub=int(meta["ksub"]),
        dsub=int(meta["dsub"]),
    )


def compact_streaming_pq(
    spark, index_path: str, id_col: str | None = None
) -> int:
    """Fold finalized streamed PQ batches into a rewritten single
    code-table base, resolving latest-wins per id GLOBALLY — the
    partial-count hygiene compact_streaming_ivf provides for the IVF
    layout (ADC has no pruning structure to preserve, so the base is
    one plain parquet table; what compaction buys here is a bounded
    partition count and a read path whose per-search latest-wins
    window shrinks to the uncompacted tail). Returns the number of
    stream batches folded.

    Same crash-safe discipline as the IVF/trending compactions — ONE
    shared core (_compact_stream_base): new base in ``codes-v{n}``,
    one atomic ``_PQ_BASE`` manifest flip (readers exclude folded
    batch ids even if their partitions survive a cleanup crash),
    folded ids bound to the checkpoint generation that numbered them
    (the ``codes_stream/_RUN`` sidecar the write-path guard already
    maintains), the NEWEST batch never folds (its crash-replay
    window), and sweeps run before AND after the flip so any crash
    window is repaired by the next run.

    ``id_col`` defaults to the id column recorded in meta.json at
    save time — pass it only to override a pre-upgrade meta that
    never recorded one.

    A residual (IVFPQ) layout folds into a cell-PARTITIONED base —
    the probe-pruned directory structure save_ivfpq_index wrote must
    survive compaction, the compact_streaming_ivf discipline."""
    import json

    with open(os.path.join(index_path, "meta.json")) as f:
        meta = json.load(f)
    if id_col is None:
        id_col = meta.get("id_col", "vec_id")
    folded_n, _version = _compact_stream_base(
        spark,
        index_path,
        manifest_name=PQ_BASE_MANIFEST,
        stream_dir_name=PQ_STREAM_DIR,
        leaf_pattern="batch_id=*",
        base_prefix="codes-v",
        plain_base="codes",
        id_col=id_col,
        sidecar_dir=os.path.join(index_path, PQ_STREAM_DIR),
        partition_by=("cell",) if "centroids" in meta else (),
    )
    return folded_n


BM25_POST_MANIFEST = "_BM25_POST_BASE"
BM25_DL_MANIFEST = "_BM25_DL_BASE"
BM25_POST_STREAM = "postings_stream"
BM25_DL_STREAM = "doclen_stream"


def _guard_bm25_generation(index_path: str, checkpoint_dir: str) -> None:
    """bm25_search resolves a re-ingested doc LATEST-WINS by batch id
    on the doclen ledger, and batch ids are only ordered WITHIN one
    checkpoint generation — _guard_pq_generation's mirror for the
    BM25 layout (sidecar in the doclen_stream dir, the ledger every
    search consults; the two compaction manifests back it up)."""
    qid = _checkpoint_query_id(checkpoint_dir)
    if qid is None:
        return
    dl_dir = os.path.join(index_path, BM25_DL_STREAM)
    _, folded_p, run_p = _fold_manifest_state(
        os.path.join(index_path, BM25_POST_MANIFEST)
    )
    _, folded_d, run_d = _fold_manifest_state(
        os.path.join(index_path, BM25_DL_MANIFEST)
    )
    owner = _run_sidecar_id(dl_dir) or run_p or run_d
    has_state = (
        folded_p
        or folded_d
        or glob.glob(os.path.join(dl_dir, "batch_id=*"))
        or glob.glob(
            os.path.join(index_path, BM25_POST_STREAM, "batch_id=*")
        )
    )
    if owner is not None and owner != qid and has_state:
        raise RuntimeError(
            f"{index_path} was ingested under streaming-query id "
            f"{owner}; checkpoint {checkpoint_dir} is a different "
            f"generation ({qid}) whose restarted batch ids would "
            "corrupt the doclen ledger's latest-wins order (or "
            "collide with manifest-folded ids and be silently "
            "excluded). Restore the original checkpoint, or re-ingest "
            "into a fresh index dir."
        )
    if owner != qid:
        os.makedirs(dl_dir, exist_ok=True)
        sidecar = os.path.join(dl_dir, RUN_SIDECAR)
        tmp = sidecar + ".tmp"
        with open(tmp, "w") as f:
            f.write(qid)
        os.replace(tmp, sidecar)


def start_bm25_ingest_stream(
    docs_stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming corpus → BM25 index maintenance (the sparse sibling
    of start_vector_ingest_stream): each micro-batch lands its
    postings (bucket-partitioned like the base, so probe reads stay
    directory-pruned over stream leaves too) and doclen partials in
    their own batch_id partitions — replays overwrite their own
    partitions with identical content (the start_rollup_stream
    exactly-once contract). A doc re-ingested in a later batch
    supersedes its earlier generation at read time (latest-wins on
    the doclen ledger — see operators/bm25_index.py); the write path
    is generation-bound (_guard_bm25_generation), and
    compact_bm25_index folds finalized batches into rewritten
    bases."""
    from ..operators.bm25_index import (
        _bucket_col,
        _doclen,
        _postings,
        _read_meta,
        _unique_docs,
    )

    n_buckets = _read_meta(path)["n_buckets"]

    def write_partial(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        _guard_bm25_generation(path, checkpoint_dir)
        # one dedup boundary per batch, feeding both tables
        u = _unique_docs(batch, id_col, text_col).localCheckpoint()
        (
            _postings(u)
            .withColumn("bucket", _bucket_col(F.col("term"), n_buckets))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "bucket")
            .parquet(os.path.join(path, BM25_POST_STREAM))
        )
        (
            _doclen(u)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(os.path.join(path, BM25_DL_STREAM))
        )

    writer = (
        docs_stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_bm25_index(spark, path: str) -> int:
    """Fold finalized streamed batches into rewritten BM25 bases —
    the same crash-safe versioned-base discipline as
    compact_streaming_ivf, run over BOTH index tables: postings fold
    with GENERATION latest-wins (all rows of each doc's newest
    generation survive as a set — row-level latest-wins would keep
    one term per doc), doclen with row latest-wins (one row per doc).
    Two manifests flip independently; a crash between the two folds
    leaves each table self-consistent (every reader resolves its own
    manifest) and the next compaction completes the pair. Returns
    the number of postings batches folded."""
    folded_n, _v = _compact_stream_base(
        spark,
        path,
        manifest_name=BM25_POST_MANIFEST,
        stream_dir_name=BM25_POST_STREAM,
        leaf_pattern="batch_id=*",
        base_prefix="postings-v",
        plain_base="postings",
        id_col="doc_id",
        sidecar_dir=os.path.join(path, BM25_DL_STREAM),
        partition_by=("bucket",),
        keep_generation=True,
    )
    _compact_stream_base(
        spark,
        path,
        manifest_name=BM25_DL_MANIFEST,
        stream_dir_name=BM25_DL_STREAM,
        leaf_pattern="batch_id=*",
        base_prefix="doclen-v",
        plain_base="doclen",
        id_col="doc_id",
        sidecar_dir=os.path.join(path, BM25_DL_STREAM),
    )
    return folded_n


def start_lm_stream(
    docs_stream: DataFrame,
    partials_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    available_now: bool = True,
    pre_tokenize: bool | str | None = None,
) -> StreamingQuery:
    """Streaming maintainer for q110's unigram LM — the perplexity
    filter's MODEL kept live as the corpus grows: each micro-batch
    lands its (token, cnt) partials in a batch_id partition (token
    counts are associative; the rollup-sink exactly-once contract),
    and ``read_lm`` merges by addition and finishes through the SAME
    unigram_lm_from_counts q110 ships — the live model equals the
    batch model bit-for-bit, so a quality threshold tuned offline
    holds online. ``pre_tokenize`` mirrors ``bpe_word_table``'s
    parameter (the shared tokenization contract, round 10): a word
    table streamed for a pre-tokenized trainer must tokenize
    micro-batches exactly as the batch build does, or retraining
    from the live table would drift; default None keeps q110's
    certified space-split."""
    from ..operators.tokenizer import _tokens_col

    def write_partial(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        (
            batch.select(
                F.explode(_tokens_col(text_col, pre_tokenize)).alias("token")
            )
            .groupBy("token")
            .agg(F.count("*").alias("cnt"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(partials_dir)
        )

    writer = (
        docs_stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_lm(spark, partials_dir: str) -> DataFrame:
    """The live unigram LM over the streamed count partials: merge
    per-batch token counts by addition (vocab-sized result) and build
    the (token, logp) model through the shared
    unigram_lm_from_counts — exactly q110's model over the same
    corpus."""
    from ..queries import unigram_lm_from_counts

    merged = (
        spark.read.parquet(partials_dir)
        .groupBy("token")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return unigram_lm_from_counts(merged)


def read_word_table(
    spark, partials_dir: str, token_pattern: str | None = None
) -> DataFrame:
    """The live WORD TABLE over the same streamed (token, cnt)
    partials start_lm_stream maintains — the tokenizer trainers'
    input (operators/tokenizer.py train_bpe, operators/unigram.py
    train_unigram) kept current as the corpus grows: merge per-batch
    counts by addition, then apply exactly the filters
    ``bpe_word_table`` applies at batch build (non-empty tokens;
    ``token_pattern`` or the symbol-delimiter exclusion), so
    retraining the tokenizer from the live table yields the SAME
    merges/pieces as a from-scratch batch build over the same corpus
    (tests/test_streaming.py pins merge-for-merge equality). At
    100 TB this removes the tokenizer's one corpus-scale pass from
    every retrain — the stream already paid it incrementally."""
    words = (
        spark.read.parquet(partials_dir)
        .groupBy(F.col("token").alias("w"))
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("w") != "")
    )
    if token_pattern is not None:
        return words.filter(F.col("w").rlike(token_pattern))
    return words.filter(~F.col("w").contains("|"))


def start_cell_histogram_stream(
    events_stream: DataFrame,
    partials_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incrementally maintained (event_type, day, hour-of-day) cell
    histogram — the shared reduction the whole monitoring family
    (q143 anomalies, q144 backtests) runs on. Same exactly-once
    partials contract as start_rollup_stream: each micro-batch writes
    its histogram-sized partial counts into a batch_id-keyed
    partition (a replayed batch overwrites its own partition with
    identical content; counts are associative, so the merged
    histogram always equals the batch recompute)."""

    def write_partial(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():  # a 0-row write creates a schema-less dir
            return
        (
            batch.groupBy(
                "event_type",
                F.date_trunc("day", F.col("ts")).alias("day"),
                F.hour("ts").alias("hod"),
            )
            .agg(F.count("*").alias("cnt"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(partials_dir)
        )

    writer = (
        events_stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cell_histogram(spark, partials_dir: str) -> DataFrame:
    """The merged live histogram: per-cell sum over batch partials."""
    return (
        spark.read.parquet(partials_dir)
        .groupBy("event_type", "day", "hod")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def read_hourly_anomalies(spark, partials_dir: str) -> DataFrame:
    """q143's seasonal median/MAD anomaly flags over the MAINTAINED
    histogram — the exact batch stage (queries.hourly_anomalies_from_
    cells, one shared definition so stream and batch cannot drift)
    applied to the incrementally kept cells. Detection cost is
    histogram-bounded no matter how much stream has been ingested."""
    from ..queries import hourly_anomalies_from_cells

    return hourly_anomalies_from_cells(read_cell_histogram(spark, partials_dir))


def read_seasonal_backtest(spark, partials_dir: str) -> DataFrame:
    """q144's seasonal-naive MAPE backtest over the MAINTAINED
    histogram — same shared-stage discipline as read_hourly_anomalies
    (queries.seasonal_backtest_from_cells): the forecaster evaluation
    reruns on histogram×histogram keyed work at read time, never a
    fact re-scan, with the identical scoring definition as the q144
    batch check."""
    from ..queries import seasonal_backtest_from_cells

    return seasonal_backtest_from_cells(
        read_cell_histogram(spark, partials_dir).localCheckpoint()
    )


def reference_band_histogram(
    df: DataFrame,
    value_col: str = "o_totalprice",
    width: float = 50000.0,
    n_bands: int = 10,
) -> DataFrame:
    """(band, ref_n) histogram of a frozen reference window — computed
    once offline, then every read_drift call compares the live stream
    against it. Banding is queries.price_band, the SAME expression the
    sink bins incoming batches with, so reference and current can
    never bin differently."""
    from ..queries import price_band

    return df.groupBy(
        price_band(value_col, width, n_bands).alias("band")
    ).agg(F.count("*").cast("long").alias("ref_n"))


def start_drift_stream(
    stream: DataFrame,
    partials_dir: str,
    checkpoint_dir: str,
    value_col: str = "o_totalprice",
    width: float = 50000.0,
    n_bands: int = 10,
    available_now: bool = True,
) -> StreamingQuery:
    """Incrementally maintained band histogram of the CURRENT window —
    the streaming twin of q122's drift check (PSI vs a frozen
    reference). Same exactly-once partials contract as
    start_rollup_stream: each micro-batch reduces to at most
    ``n_bands`` count rows written into a batch_id-keyed partition
    (a replayed batch overwrites its own partition with identical
    content; counts are associative, so the merged histogram always
    equals the batch recompute). Detection cost at read time is
    histogram-bounded no matter how much stream has been ingested —
    the 100-TB property: the fact table is touched once per batch,
    never re-scanned per drift check."""
    from ..queries import price_band

    band = price_band(value_col, width, n_bands).alias("band")

    def write_partial(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():  # a 0-row write creates a schema-less dir
            return
        (
            batch.groupBy(band)
            .agg(F.count("*").alias("cnt"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(partials_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_drift(spark, partials_dir: str, reference: DataFrame) -> DataFrame:
    """q122's PSI report over the MAINTAINED current-window histogram
    vs a frozen (band, ref_n) reference — the exact batch stage
    (queries.psi_from_band_counts, one shared definition so stream
    and batch cannot drift). A band seen in only one side still
    reports (count 0 on the other), matching the batch query's
    conditional-sum behavior."""
    from ..queries import psi_from_band_counts

    cur = (
        spark.read.parquet(partials_dir)
        .groupBy("band")
        .agg(F.sum("cnt").cast("long").alias("cur_n"))
    )
    agg = (
        reference.select("band", F.col("ref_n").cast("long").alias("ref_n"))
        .join(cur, "band", "full_outer")
        .select(
            "band",
            F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
            F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
        )
    )
    return psi_from_band_counts(agg)


def read_trending(
    spark,
    partials_dir: str,
    half_life_days: float = 1.0,
    k: int | None = 20,
) -> DataFrame:
    """The live trending view: rescale every per-batch partial to the
    newest anchor and merge. ``k=None`` returns all users (for joins /
    exact comparison); otherwise top-k by hot_score like q145.

    Resolves the compaction manifest: folded batch ids are EXCLUDED
    (their data lives in the versioned base; their partitions may
    still exist after a cleanup crash) and the base partial merges in
    like any other."""
    version, folded = _trending_base_state(partials_dir)
    h_us = float(half_life_days) * 86400000000.0
    p = spark.read.parquet(partials_dir)
    if folded:
        p = p.filter(~F.col("batch_id").isin(sorted(folded)))
    p = p.select("user_id", "anchor_us", "n_events", "decayed_sum")
    if version is not None:
        p = p.unionByName(
            spark.read.parquet(os.path.join(partials_dir, f"_base-v{version}"))
        )
    t = p.agg(F.max("anchor_us").alias("t_us"))
    scored = (
        p.crossJoin(F.broadcast(t))
        .select(
            "user_id",
            "n_events",
            # round-then-exact-decimal-sum (q145's determinism rule):
            # summing unrounded doubles across partials is partition-
            # order-dependent in the last ulp, which can flip the
            # rounded score or a top-k tie between runs
            F.round(
                F.col("decayed_sum").cast("double")
                * F.pow(
                    0.5, (F.col("t_us") - F.col("anchor_us")) / F.lit(h_us)
                ),
                8,
            )
            .cast("decimal(27,8)")
            .alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.round(F.sum("s").cast("double"), 6).alias("hot_score"),
        )
    )
    if k is None:
        return scored
    return scored.orderBy(F.desc("hot_score"), "user_id").limit(k)


def start_corpus_health_stream(
    docs_stream: DataFrame,
    partials_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin of q101's per-source corpus health rollup: each
    micro-batch writes a per-source partial (doc/gate-pass counts,
    exact-decimal token sum, and an HLL sketch of the content
    fingerprint — the distinct count is NOT additive, so the partial
    carries the mergeable sketch instead) into its own batch_id
    partition; ``read_corpus_health`` merges partials into the live
    dashboard view. Gate expressions come from operators.corpus_gates
    — the same single source q67/q101/corpus_quality_gates build
    from — so the streaming health numbers measure exactly the gate
    the batch pipeline enforces. Replay-safe like start_rollup_stream
    (a replayed batch overwrites its own partition)."""
    from ..operators.corpus_gates import (
        content_fingerprint,
        quality_lang_predicate,
        token_count,
    )

    def write_partial(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():  # a 0-row write creates a schema-less dir
            return
        spark = batch.sparkSession
        g = batch.select(
            "source",
            token_count("text").cast("long").alias("n_tokens"),
            F.when(quality_lang_predicate("text"), 1)
            .otherwise(0)
            .alias("q_pass"),
            content_fingerprint("text").alias("fp"),
        )
        (
            g.groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("q_pass").cast("long").alias("n_quality_pass"),
                F.sum(F.col("n_tokens").cast("decimal(27,0)")).alias(
                    "sum_tokens"
                ),
                F.hll_sketch_agg("fp").alias("fp_hll"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")  # race-free per-writer form
            .partitionBy("batch_id")
            .parquet(partials_dir)
        )

    writer = (
        docs_stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_corpus_health(spark, partials_dir: str) -> DataFrame:
    """The live health view: merge per-batch partials — counts and
    token sums add exactly, distinct fingerprints merge through the
    HLL union (approximate, ~2%)."""
    p = spark.read.parquet(partials_dir)
    return (
        p.groupBy("source")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_quality_pass").cast("long").alias("n_quality_pass"),
            F.hll_sketch_estimate(F.hll_union_agg("fp_hll")).alias(
                "approx_unique"
            ),
            (
                F.sum("sum_tokens").cast("double")
                / F.sum("n_docs").cast("double")
            ).alias("avg_tokens"),
        )
        .withColumn(
            "approx_dup_rate",
            F.round(
                1 - F.col("approx_unique") / F.col("n_docs").cast("double"), 4
            ),
        )
    )


def start_active_users_stream(
    events_stream: DataFrame,
    partials_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin of q133's sliding DAU/WAU: each micro-batch
    writes per-day HLL partials of user_id (plus an exact event
    count) into its own batch_id partition — the operators/sketches
    daily-sketch discipline maintained incrementally. COUNT DISTINCT
    does not decompose over frames OR over micro-batches, but the HLL
    register state is a pure elementwise max, so per-batch partials
    union to exactly the sketch a one-shot batch pass builds —
    ``read_active_users`` answers daily and trailing-window actives
    from day-sized sketch rows, never rescanning events. Same
    exactly-once contract as start_rollup_stream (a replayed batch
    overwrites its own partition with identical content)."""

    def write_partial(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():  # a 0-row write creates a schema-less dir
            return
        (
            batch.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
            .agg(
                F.hll_sketch_agg("user_id").alias("users_hll"),
                F.count("*").alias("n_events"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(partials_dir)
        )

    writer = (
        events_stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_active_users(
    spark, partials_dir: str, window_days: int = 7
) -> DataFrame:
    """The live DAU/WAU view over the streamed daily HLL partials:
    per-batch sketches union into one sketch per day (day-sized
    table), each day-sketch contributes to its ≤``window_days``
    trailing window ends via the q133 pair-explode — 7× a DAYS-count
    table of KB sketch rows, never 7× events — and the per-window
    union estimates the distinct actives. Trailing windows clip at
    the observed max day (q133's broadcast bound). Approximate where
    q133 is exact (the HLL trade that makes 1000-day lookbacks read
    KBs); counts carry the sketch's ~2% error."""
    daily = (
        spark.read.parquet(partials_dir)
        .groupBy("day")
        .agg(F.hll_union_agg("users_hll").alias("users_hll"))
        # referenced by dau, the window explode, and the bounds agg —
        # pay the partial merge once (days-sized result)
        .localCheckpoint()
    )
    bounds = daily.agg(F.max("day").alias("dmax"))
    dau = daily.select(
        "day", F.hll_sketch_estimate("users_hll").alias("dau")
    )
    contrib = (
        daily.select(
            "users_hll",
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.col("day")
                    + F.expr(f"INTERVAL {int(window_days) - 1} DAY"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("wend"),
        )
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("wend") <= F.col("dmax"))
    )
    wau = contrib.groupBy("wend").agg(
        F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias("wau")
    )
    return (
        dau.join(wau, dau.day == wau.wend)
        .select("day", "dau", "wau")
        .orderBy("day")
    )


def start_rfm_stream(
    orders_stream: DataFrame,
    partials_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin of q142's RFM segmentation — the documented
    update algebra made executable: every per-customer input to the
    scoring is an ASSOCIATIVE sufficient statistic (max last-order
    date for recency, order count for frequency, exact-decimal price
    sum for monetary), so each micro-batch lands a customer-level
    partial in its own batch_id partition and ``read_rfm`` merges
    (max / sum / sum) and re-scores — never rescanning orders.
    Partials are |customers-per-batch| rows. Same exactly-once
    contract as start_rollup_stream (a replayed batch overwrites its
    own partition with identical content; all merges associative, so
    the merged view always equals the batch recompute EXACTLY — the
    decimal sum and date max carry no float drift)."""

    def write_partial(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():  # a 0-row write creates a schema-less dir
            return
        (
            batch.groupBy("o_custkey")
            .agg(
                F.max("o_orderdate").alias("last_order"),
                F.count("*").alias("frequency"),
                # pin the stored width: sum(decimal(27,2)) infers
                # (37,2) — cast so partials never schema-clash
                F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
                .cast("decimal(38,2)")
                .alias("monetary_sum"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(partials_dir)
        )

    writer = (
        orders_stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rfm(spark, partials_dir: str) -> DataFrame:
    """The live RFM view: merge the per-batch customer partials
    (max last-order / summed count / exact-decimal monetary sum),
    rebuild q142's customer metrics table against the merged anchor
    (max order date seen so far), and score through the SAME shared
    quintile machinery (operators.relational.rfm_scores) — so the
    streaming view equals q142's one-shot batch output exactly, not
    within tolerance."""
    from ..operators.relational import rfm_scores

    merged = (
        spark.read.parquet(partials_dir)
        .groupBy("o_custkey")
        .agg(
            F.max("last_order").alias("last_order"),
            F.sum("frequency").cast("long").alias("frequency"),
            F.sum("monetary_sum").cast("decimal(38,2)").alias("monetary_sum"),
        )
    )
    anchor = merged.agg(F.max("last_order").alias("anchor"))
    cust = (
        merged.crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("anchor", "last_order").alias("recency_days"),
            "frequency",
            F.col("monetary_sum").cast("double").alias("monetary"),
            F.floor(F.col("monetary_sum").cast("double") / 1000)
            .cast("long")
            .alias("mon_band"),
        )
        # three histogram builds + three map join-backs read this
        .localCheckpoint()
    )
    return rfm_scores(cust)


def start_daily_revenue_stream(
    orders_stream: DataFrame,
    partials_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin of q163's CUSUM change-point scan — the feed
    half: each micro-batch lands per-day EXACT-DECIMAL revenue
    partials in its own batch_id partition.
    The CUSUM estimator needs only the day-grain revenue series, and
    a decimal sum is associative, so per-batch partials merge to
    exactly the one-shot daily table no matter how the stream was
    batched — ``read_cusum`` re-scores through the SAME shared scan
    (operators.relational.cusum_scan) q163 ships, so stream == batch
    is exact, not a tolerance. Same exactly-once contract as
    start_rollup_stream (a replayed batch overwrites its own
    partition with identical content)."""

    def write_partial(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():  # a 0-row write creates a schema-less dir
            return
        (
            batch.groupBy(
                F.date_trunc("day", F.col("o_orderdate")).alias("day")
            )
            .agg(
                # pin the stored width: sum(decimal(27,2)) infers
                # (37,2) — cast so partials never schema-clash. The
                # day's exact-decimal revenue is the ONLY sufficient
                # statistic the CUSUM estimator consumes.
                F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
                .cast("decimal(38,2)")
                .alias("rev"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(partials_dir)
        )

    writer = (
        orders_stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cusum(spark, partials_dir: str) -> DataFrame:
    """The live CUSUM view over the streamed daily revenue partials:
    merge per-batch day rows with one exact-decimal sum (days-sized
    result), then run the SAME cusum_scan q163 uses. The merged sum
    equals the one-shot daily aggregate exactly (decimal addition is
    associative), so every downstream double, round, and peak flag is
    bit-identical to the batch query's."""
    from ..operators.relational import cusum_scan

    daily = (
        spark.read.parquet(partials_dir)
        .groupBy("day")
        .agg(F.sum("rev").cast("decimal(38,2)").alias("rev"))
    )
    return cusum_scan(daily)


def start_calibration_stream(
    docs_stream: DataFrame,
    partials_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin of q164's calibration audit — live model
    monitoring: each micro-batch of documents is scored through the
    SAME clf_score_frame the batch classifier ships (q129/q164's one
    shared scorer), reduced to per-bin sufficient statistics
    (clf_bin_stats: count / exact-decimal score sum / positive
    count — all associative), and landed in a batch_id partition.
    ``read_calibration`` merges by addition and finishes through the
    shared formulas, so the live reliability table equals q164's
    one-shot output EXACTLY — drift in a bin's gap column is model
    degradation, not pipeline noise. Same exactly-once contract as
    start_rollup_stream."""

    def write_partial(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():  # a 0-row write creates a schema-less dir
            return
        from ..queries import clf_bin_stats, clf_score_frame

        (
            clf_bin_stats(clf_score_frame(batch))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(partials_dir)
        )

    writer = (
        docs_stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_calibration(spark, partials_dir: str) -> DataFrame:
    """The live reliability table over the streamed calibration
    partials: merge per-batch bin statistics by addition (counts and
    exact-decimal sums are associative) and finish through the SAME
    calibration_from_bin_stats q164 uses — bit-identical to the
    one-shot batch audit over the same documents."""
    from ..queries import calibration_from_bin_stats

    merged = (
        spark.read.parquet(partials_dir)
        .groupBy("bin")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("score_sum").cast("decimal(38,6)").alias("score_sum"),
            F.sum("y_sum").cast("long").alias("y_sum"),
        )
    )
    return calibration_from_bin_stats(merged)


def start_contract_gate_stream(
    stream: DataFrame,
    checks,
    out_dir: str,
    checkpoint_dir: str,
    report_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Data-contract gate on ingest (streaming q130): every
    micro-batch is evaluated against a declarative constraint suite
    (operators.quality_checks) BEFORE it lands. A violating batch
    writes its verdict report (when ``report_dir`` is given) and then
    RAISES — the query fails, the checkpoint holds the offset, and
    the batch replays after the upstream fix, so bad data never
    reaches the table silently. Clean batches land into their own
    ``batch_id`` partition with dynamic overwrite, making replays
    idempotent (same protocol as start_rollup_stream). The suite
    itself is one aggregation pass over the cached batch; the verdict
    collect is constraint-count-sized (control-plane, not data-plane).
    The report lands BEFORE the gate raises and is keyed by batch_id,
    so a violation is observable even though its data never lands."""
    from ..operators.quality_checks import constraint_report

    def gate(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            # no-data batches (checkpoint-recovery replays, empty
            # offset ranges) carry nothing to gate or land; evaluating
            # the suite on them would fail closed (0/0 ratios observe
            # NULL -> passed=false) and wedge the stream permanently
            return
        batch.persist()
        try:
            rep = constraint_report(batch, checks)
            rows = rep.collect()
            if report_dir is not None:
                (
                    spark.createDataFrame(rows, rep.schema)
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(report_dir)
                )
            failed = [r["constraint"] for r in rows if not r["passed"]]
            if failed:
                raise ValueError(
                    f"data contract violated in batch {batch_id}: "
                    f"{failed}"
                )
            (
                batch.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(out_dir)
            )
        finally:
            batch.unpersist()

    writer = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_bundle_encode_stream(
    docs_stream: DataFrame,
    bundle,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    emit_ids: bool = True,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming corpus tokenization with a FROZEN TokenizerBundle:
    each micro-batch runs ``encode_corpus_with_bundle`` (the q197/q200
    chain — normalization, the bundle's pre-tokenize rule, trie
    encode, OOV policy, int32 ids) and appends the encoded documents.
    The stream==batch twin of the round-12 id-encode path.

    Why THIS is streamable while training/packing are not (the
    packing design note's counterpart): given a frozen bundle the
    encode is a PURE per-document function — no cross-doc state, so
    arrival order, batching, and replay cannot change any document's
    ids. Per batch it pays the batch-scale word table + a vocab-sized
    trie pass; the corpus-scale work is one broadcast join inside the
    batch. Training stays batch (the merge sequence depends on global
    counts); packing stays snapshot-time (offsets are global running
    sums); encoding sits exactly between — freeze the artifact,
    stream the corpus through it.

    Exactly-once: each batch overwrites its own ``batch_id=N``
    partition (dynamic partition overwrite keyed by the foreachBatch
    id, the engine's idempotent-sink recipe), so checkpoint replay of
    a committed batch rewrites identical bytes instead of appending
    duplicates."""
    from ..operators.tokenizer import encode_corpus_with_bundle

    def encode(batch: DataFrame, batch_id: int) -> None:
        out = encode_corpus_with_bundle(
            batch,
            bundle,
            id_col=id_col,
            text_col=text_col,
            emit_ids=emit_ids,
        )
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    writer = (
        docs_stream.writeStream.foreachBatch(encode)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
