"""SCD-2 merge: version chains, no-ops, new keys, batch dedup."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

TS = datetime.datetime


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "cust_id long, segment string, valid_from timestamp, valid_to timestamp, is_current boolean"
    )


def _upd(spark, rows):
    return spark.createDataFrame(rows, "cust_id long, segment string, ts timestamp")


def test_scd2_closes_opens_and_passes_through(spark):
    from big_data_spark.operators.scd import scd2_apply

    t0, t1, t2 = TS(2026, 1, 1), TS(2026, 2, 1), TS(2026, 3, 1)
    dim = _dim(
        spark,
        [
            (1, "BUILDING", t0, t1, False),   # history row
            (1, "MACHINERY", t1, None, True),  # current, will change
            (2, "AUTOMOBILE", t0, None, True),  # current, identical update
            (3, "HOUSEHOLD", t0, None, True),  # current, no update
        ],
    )
    upd = _upd(
        spark,
        [
            (1, "FURNITURE", t2),
            (2, "AUTOMOBILE", t2),  # no-op
            (4, "BUILDING", t2),    # brand-new key
        ],
    )
    out = scd2_apply(dim, upd, key="cust_id", tracked=["segment"]).cache()

    assert out.count() == 6  # 4 originals + 1 new version + 1 new key
    cur = {r["cust_id"]: r for r in out.filter("is_current").collect()}
    assert set(cur) == {1, 2, 3, 4}
    assert cur[1]["segment"] == "FURNITURE" and cur[1]["valid_from"] == t2
    assert cur[2]["valid_from"] == t0  # no-op kept the old interval
    closed = out.filter(
        (F.col("cust_id") == 1) & (F.col("segment") == "MACHINERY")
    ).first()
    assert closed["valid_to"] == t2 and not closed["is_current"]
    # reapplying the same batch is idempotent (all updates are no-ops)
    again = scd2_apply(out, upd, key="cust_id", tracked=["segment"])
    assert again.count() == 6


def test_scd2_latest_update_per_key_wins(spark):
    from big_data_spark.operators.scd import scd2_apply

    t0, t1, t2 = TS(2026, 1, 1), TS(2026, 2, 1), TS(2026, 3, 1)
    dim = _dim(spark, [(1, "BUILDING", t0, None, True)])
    upd = _upd(spark, [(1, "MACHINERY", t1), (1, "FURNITURE", t2)])
    out = scd2_apply(dim, upd, key="cust_id", tracked=["segment"])
    cur = out.filter("is_current").collect()
    assert len(cur) == 1 and cur[0]["segment"] == "FURNITURE"
    assert out.count() == 2  # old closed at t2, one new version


def test_scd2_null_safe_comparison(spark):
    from big_data_spark.operators.scd import scd2_apply

    t0, t1 = TS(2026, 1, 1), TS(2026, 2, 1)
    dim = _dim(spark, [(1, None, t0, None, True)])
    # null -> null is a no-op; null -> value opens a version
    out1 = scd2_apply(dim, _upd(spark, [(1, None, t1)]), "cust_id", ["segment"])
    assert out1.count() == 1 and out1.first()["valid_from"] == t0
    out2 = scd2_apply(dim, _upd(spark, [(1, "BUILDING", t1)]), "cust_id", ["segment"])
    assert out2.count() == 2
    assert out2.filter("is_current").first()["segment"] == "BUILDING"


def test_scd2_presence_not_inferred_from_data_columns(spark):
    """A current row with NULL valid_from and an update with NULL ts
    are still *present* on their join side (explicit markers): the
    null-from row keeps its history instead of being rewritten as a
    fresh insert, and the null-ts update still applies."""
    from big_data_spark.operators.scd import scd2_apply

    t1 = TS(2026, 2, 1)
    dim = _dim(spark, [(1, "BUILDING", None, None, True)])
    # identical update: must be a no-op even though valid_from is NULL
    out = scd2_apply(dim, _upd(spark, [(1, "BUILDING", t1)]), "cust_id", ["segment"])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["valid_from"] is None
    assert rows[0]["is_current"]
    # differing update with NULL ts: closes the old version, opens new
    out2 = scd2_apply(dim, _upd(spark, [(1, "MACHINERY", None)]), "cust_id", ["segment"])
    cur = out2.filter("is_current").collect()
    assert len(cur) == 1 and cur[0]["segment"] == "MACHINERY"
    assert out2.count() == 2


def test_streaming_scd2_dimension_maintenance(spark, tmp_path, monkeypatch):
    """Updates streamed across micro-batches maintain a versioned
    dimension: later batches close earlier versions, history
    accumulates, exactly one current row per key. The merge path must
    never materialize the snapshot on the driver."""
    from pyspark.sql import DataFrame

    from big_data_spark.streaming.sinks import read_scd2_dim, start_scd2_stream

    src = tmp_path / "updates"
    src.mkdir()
    batch1 = [(1, "BUILDING", "2026-01-01T00:00:00"), (2, "AUTOMOBILE", "2026-01-01T00:00:00")]
    batch2 = [(1, "MACHINERY", "2026-02-01T00:00:00"), (3, "HOUSEHOLD", "2026-02-01T00:00:00")]
    for name, rows in (("a", batch1), ("b", batch2)):
        spark.createDataFrame(rows, "cust_id long, segment string, ts_s string") \
            .coalesce(1).write.mode("overwrite").json(str(src / name))
    stream = (
        spark.readStream.schema("cust_id long, segment string, ts_s string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
    )
    dim_dir, ckpt = str(tmp_path / "dim"), str(tmp_path / "ckpt")
    collects = []
    real_collect = DataFrame.collect
    monkeypatch.setattr(
        DataFrame, "collect", lambda self: (collects.append(1), real_collect(self))[1]
    )
    q = start_scd2_stream(
        stream, dim_dir, ckpt, key="cust_id", tracked=["segment"]
    )
    q.awaitTermination(120)
    monkeypatch.undo()
    assert not collects, "SCD-2 merge path materialized data on the driver"
    dim = read_scd2_dim(spark, dim_dir)
    cur = {r["cust_id"]: r["segment"] for r in dim.filter("is_current").collect()}
    assert cur == {1: "MACHINERY", 2: "AUTOMOBILE", 3: "HOUSEHOLD"}
    # key 1 has a closed BUILDING version if batches arrived in order,
    # or a single merged version if both files landed in one batch —
    # either way: no duplicate current rows and history is consistent
    one = dim.filter("cust_id = 1").collect()
    assert len([r for r in one if r["is_current"]]) == 1
    closed = [r for r in one if not r["is_current"]]
    for r in closed:
        assert r["valid_to"] is not None
    # snapshot layout: manifest + exactly the current version directory
    # (superseded versions pruned after the atomic repoint)
    import os

    names = sorted(os.listdir(dim_dir))
    versions = [n for n in names if n.startswith("v-")]
    assert "_CURRENT" in names and len(versions) == 1, names
    with open(os.path.join(dim_dir, "_CURRENT")) as f:
        lines = f.read().strip().splitlines()
    # line 1: current version; line 2: owning streaming-query id
    assert lines[0] == versions[0]
    assert len(lines) == 2 and lines[1]


def test_scd2_crash_window_leaves_old_snapshot_live(spark, tmp_path):
    """Atomicity contract: a snapshot directory written WITHOUT the
    manifest repoint (the crash window) must be invisible to readers —
    the previous version stays live until os.replace lands."""
    import os

    from big_data_spark.streaming.sinks import read_scd2_dim

    dim_dir = str(tmp_path / "dim")
    os.makedirs(dim_dir)
    good = spark.createDataFrame(
        [(1, "BUILDING", True)], "cust_id long, segment string, is_current boolean"
    )
    good.write.parquet(os.path.join(dim_dir, "v-1"))
    with open(os.path.join(dim_dir, "_CURRENT"), "w") as f:
        f.write("v-1")
    # simulate a crash: v-2 fully written, manifest never repointed
    spark.createDataFrame(
        [(1, "MACHINERY", True)], "cust_id long, segment string, is_current boolean"
    ).write.parquet(os.path.join(dim_dir, "v-2"))

    dim = read_scd2_dim(spark, dim_dir)
    assert [r["segment"] for r in dim.collect()] == ["BUILDING"]

    # manifest pointing at a missing dir is a hard error, not silence
    with open(os.path.join(dim_dir, "_CURRENT"), "w") as f:
        f.write("v-404")
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_scd2_dim(spark, dim_dir)


def test_scd2_version_retention_time_travel(spark, tmp_path):
    """keep_versions>1 retains a readable snapshot window: the
    manifest tracks the newest version while older retained versions
    stay time-travel readable and show the pre-merge state."""
    from big_data_spark.streaming.sinks import (
        list_scd2_versions,
        read_scd2_dim,
        start_scd2_stream,
    )

    src = tmp_path / "updates"
    src.mkdir()
    batches = [
        ("a", [(1, "BUILDING", "2026-01-01T00:00:00")]),
        ("b", [(1, "MACHINERY", "2026-02-01T00:00:00")]),
        ("c", [(1, "FURNITURE", "2026-03-01T00:00:00")]),
    ]
    for name, rows in batches:
        spark.createDataFrame(rows, "cust_id long, segment string, ts_s string") \
            .coalesce(1).write.mode("overwrite").json(str(src / name))
    stream = (
        spark.readStream.schema("cust_id long, segment string, ts_s string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
    )
    dim_dir, ckpt = str(tmp_path / "dim"), str(tmp_path / "ckpt")
    q = start_scd2_stream(
        stream, dim_dir, ckpt, key="cust_id", tracked=["segment"],
        keep_versions=2,
    )
    q.awaitTermination(120)

    versions = list_scd2_versions(dim_dir)
    assert len(versions) == 2, versions  # pruned to the retention window

    current = read_scd2_dim(spark, dim_dir)
    n_current = current.count()
    older = read_scd2_dim(spark, dim_dir, version=versions[0])
    # the older retained snapshot predates the newest merge: strictly
    # fewer history rows, and it must NOT contain the current snapshot's
    # newest segment value if batches arrived separately
    assert older.count() <= n_current
    segs_now = {r["segment"] for r in current.collect()}
    assert {r["segment"] for r in older.collect()} <= segs_now

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_scd2_dim(spark, dim_dir, version="v-99999")


def test_scd2_replay_after_repoint_is_noop(spark, tmp_path):
    """Crash window AFTER the manifest repoint but BEFORE the
    checkpoint commit: the replayed batch finds _CURRENT already
    naming its own v-{batch_id} and must no-op — re-merging would
    read the snapshot directory while overwriting it (Spark rejects
    the cycle) and wedge the stream forever."""
    from big_data_spark.streaming.sinks import (
        read_scd2_dim,
        start_scd2_stream,
    )

    src = tmp_path / "updates"
    src.mkdir()
    rows = [(1, "BUILDING", "2026-01-01T00:00:00"),
            (2, "AUTOMOBILE", "2026-01-01T00:00:00")]
    spark.createDataFrame(
        rows, "cust_id long, segment string, ts_s string"
    ).coalesce(1).write.mode("overwrite").json(str(src / "a"))

    def run(ckpt: str):
        stream = (
            spark.readStream.schema("cust_id long, segment string, ts_s string")
            .json(str(src / "*"))
            .withColumn("ts", F.to_timestamp("ts_s"))
            .drop("ts_s")
        )
        q = start_scd2_stream(
            stream, dim_dir, ckpt, key="cust_id", tracked=["segment"]
        )
        q.awaitTermination(120)

    dim_dir = str(tmp_path / "dim")
    ckpt = str(tmp_path / "c1")
    run(ckpt)
    before = sorted(map(tuple, read_scd2_dim(spark, dim_dir).collect()))
    # simulate the crash: drop the checkpoint COMMIT for batch 0 while
    # keeping its offsets + query id — restarting from this checkpoint
    # replays batch 0 (same query) against a manifest that already
    # points at v-0, exactly the post-repoint crash state
    import contextlib
    import os

    os.remove(os.path.join(ckpt, "commits", "0"))
    with contextlib.suppress(FileNotFoundError):  # checksum twin
        os.remove(os.path.join(ckpt, "commits", ".0.crc"))
    run(ckpt)
    after = sorted(map(tuple, read_scd2_dim(spark, dim_dir).collect()))
    assert after == before


def test_scd2_fresh_checkpoint_on_existing_dim_fails_loudly(spark, tmp_path):
    """Pairing an existing dim_dir with a FRESH checkpoint restarts
    batch ids at 0, so the version-name replay test would silently
    skip batches carrying new data. The manifest records the owning
    streaming-query id; a mismatched checkpoint must fail loudly, not
    no-op."""
    import pytest as _pytest

    from big_data_spark.streaming.sinks import start_scd2_stream

    src = tmp_path / "updates"
    src.mkdir()
    rows = [(1, "BUILDING", "2026-01-01T00:00:00")]
    spark.createDataFrame(
        rows, "cust_id long, segment string, ts_s string"
    ).coalesce(1).write.mode("overwrite").json(str(src / "a"))

    def run(ckpt: str):
        stream = (
            spark.readStream.schema("cust_id long, segment string, ts_s string")
            .json(str(src / "*"))
            .withColumn("ts", F.to_timestamp("ts_s"))
            .drop("ts_s")
        )
        q = start_scd2_stream(
            stream, str(tmp_path / "dim"), ckpt, key="cust_id",
            tracked=["segment"],
        )
        q.awaitTermination(120)

    run(str(tmp_path / "c1"))
    # new data lands; a fresh checkpoint would replay it as batch 0 and
    # the old basename guard would swallow it
    rows2 = [(1, "MACHINERY", "2026-02-01T00:00:00")]
    spark.createDataFrame(
        rows2, "cust_id long, segment string, ts_s string"
    ).coalesce(1).write.mode("overwrite").json(str(src / "b"))
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with _pytest.raises(StreamingQueryException, match="bound to its original checkpoint"):
        run(str(tmp_path / "c2"))


def test_scd2_pre_upgrade_manifest_rejects_restarted_batch_ids(
    spark, tmp_path
):
    """A PRE-UPGRADE manifest (no run-id line) makes the query-id
    guard inert, but batch ids are monotonic within a generation — so
    a fresh checkpoint replaying batch 0 into a dim already at v-1
    must STILL fail loudly (previously it repointed the manifest to
    v-0, which the numeric version sort makes the OLDEST snapshot, so
    the retention sweep could delete the just-committed current
    version and leave the manifest dangling). The current snapshot
    must survive the rejected write untouched."""
    import os

    import pytest as _pytest

    from big_data_spark.streaming.sinks import (
        SCD2_MANIFEST,
        read_scd2_dim,
        start_scd2_stream,
    )

    src = tmp_path / "updates"
    src.mkdir()
    for name, rows in (
        ("a", [(1, "BUILDING", "2026-01-01T00:00:00")]),
        ("b", [(1, "MACHINERY", "2026-02-01T00:00:00")]),
    ):
        spark.createDataFrame(
            rows, "cust_id long, segment string, ts_s string"
        ).coalesce(1).write.mode("overwrite").json(str(src / name))

    dim_dir = str(tmp_path / "dim")

    def run(ckpt: str):
        stream = (
            spark.readStream.schema(
                "cust_id long, segment string, ts_s string"
            )
            .option("maxFilesPerTrigger", 1)
            .json(str(src / "*"))
            .withColumn("ts", F.to_timestamp("ts_s"))
            .drop("ts_s")
        )
        q = start_scd2_stream(
            stream, dim_dir, ckpt, key="cust_id", tracked=["segment"]
        )
        q.awaitTermination(120)

    run(str(tmp_path / "c1"))  # two batches -> dim at v-1
    before = sorted(map(tuple, read_scd2_dim(spark, dim_dir).collect()))

    # simulate the pre-upgrade manifest: strip the run-id line
    manifest = os.path.join(dim_dir, SCD2_MANIFEST)
    with open(manifest) as f:
        version_line = f.read().splitlines()[0]
    assert version_line == "v-1"
    with open(manifest, "w") as f:
        f.write(version_line)

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with _pytest.raises(
        StreamingQueryException, match="foreign generation"
    ):
        run(str(tmp_path / "c2"))  # fresh checkpoint replays batch 0

    # manifest still points at the surviving v-1 snapshot
    with open(manifest) as f:
        assert f.read().splitlines()[0] == "v-1"
    after = sorted(map(tuple, read_scd2_dim(spark, dim_dir).collect()))
    assert after == before


def test_scd2_pre_upgrade_equal_id_collision_is_ambiguous(
    spark, tmp_path
):
    """The equal-id collision on a PRE-UPGRADE manifest (batch 0 vs a
    dim at v-0, no run-id line) cannot be told apart from a genuine
    post-commit crash replay — silently no-opping would drop a fresh
    generation's first batch forever, so it must FAIL with the
    recovery instructions; appending the query-id line per those
    instructions then lets the genuine replay complete as a no-op."""
    import contextlib
    import os

    import pytest as _pytest

    from big_data_spark.streaming.sinks import (
        SCD2_MANIFEST,
        _checkpoint_query_id,
        read_scd2_dim,
        start_scd2_stream,
    )

    src = tmp_path / "updates"
    src.mkdir()
    spark.createDataFrame(
        [(1, "BUILDING", "2026-01-01T00:00:00")],
        "cust_id long, segment string, ts_s string",
    ).coalesce(1).write.mode("overwrite").json(str(src / "a"))

    dim_dir = str(tmp_path / "dim")
    ckpt = str(tmp_path / "c1")

    def run(ck):
        stream = (
            spark.readStream.schema(
                "cust_id long, segment string, ts_s string"
            )
            .json(str(src / "*"))
            .withColumn("ts", F.to_timestamp("ts_s"))
            .drop("ts_s")
        )
        q = start_scd2_stream(
            stream, dim_dir, ck, key="cust_id", tracked=["segment"]
        )
        q.awaitTermination(120)

    run(ckpt)  # one batch -> dim at v-0
    before = sorted(map(tuple, read_scd2_dim(spark, dim_dir).collect()))

    # strip the run-id line (pre-upgrade manifest) AND simulate the
    # post-commit crash (deleted commit) -> the replay is ambiguous
    manifest = os.path.join(dim_dir, SCD2_MANIFEST)
    with open(manifest, "w") as f:
        f.write("v-0")
    os.remove(os.path.join(ckpt, "commits", "0"))
    with contextlib.suppress(FileNotFoundError):
        os.remove(os.path.join(ckpt, "commits", ".0.crc"))

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with _pytest.raises(StreamingQueryException, match="collides"):
        run(ckpt)

    # recovery per the error message: re-bind the manifest to the
    # original query id -> the genuine replay no-ops cleanly
    with open(manifest, "w") as f:
        f.write(f"v-0\n{_checkpoint_query_id(ckpt)}")
    run(ckpt)
    assert sorted(map(tuple, read_scd2_dim(spark, dim_dir).collect())) == before


def test_scd2_version_diff_change_feed(spark, tmp_path):
    """scd2_version_diff between retained snapshots: versions opened
    after v_from report 'insert', versions CLOSED by a later update
    report 'update' (the business key keeps its original type), an
    unchanged dimension span diffs empty, and
    pointing the diff backward surfaces the removed history rows as
    'delete' — the append-only integrity signal."""
    from big_data_spark.streaming.sinks import (
        list_scd2_versions,
        scd2_version_diff,
        start_scd2_stream,
    )

    src = tmp_path / "updates"
    src.mkdir()
    batches = [
        ("a", [(1, "BUILDING", "2026-01-01T00:00:00"),
               (2, "AUTOMOBILE", "2026-01-01T00:00:00")]),
        ("b", [(1, "MACHINERY", "2026-02-01T00:00:00")]),
        ("c", [(3, "FURNITURE", "2026-03-01T00:00:00")]),
    ]
    for name, rows in batches:
        spark.createDataFrame(
            rows, "cust_id long, segment string, ts_s string"
        ).coalesce(1).write.mode("overwrite").json(str(src / name))
    stream = (
        spark.readStream.schema("cust_id long, segment string, ts_s string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
    )
    dim_dir = str(tmp_path / "dim")
    q = start_scd2_stream(
        stream, dim_dir, str(tmp_path / "ck"), key="cust_id",
        tracked=["segment"], keep_versions=3,
    )
    q.awaitTermination(120)
    versions = list_scd2_versions(dim_dir)
    assert versions == ["v-0", "v-1", "v-2"], versions

    d01 = {
        (r["cust_id"], str(r["valid_from"]), r["change_type"])
        for r in scd2_version_diff(
            spark, dim_dir, "v-0", "v-1", key="cust_id",
            tracked=["segment"],
        ).collect()
    }
    # batch b: cust 1's 2026-01 version CLOSED (update) + a new
    # 2026-02 version opened (insert); cust 2 untouched
    assert d01 == {
        (1, "2026-01-01 00:00:00", "update"),
        (1, "2026-02-01 00:00:00", "insert"),
    }, d01

    d12 = {
        (r["cust_id"], r["change_type"])
        for r in scd2_version_diff(
            spark, dim_dir, "v-1", "v-2", key="cust_id",
            tracked=["segment"],
        ).collect()
    }
    assert d12 == {(3, "insert")}, d12  # batch c: brand-new key

    # identical span -> empty feed
    assert scd2_version_diff(
        spark, dim_dir, "v-2", "v-2", key="cust_id", tracked=["segment"]
    ).count() == 0

    # backward diff: the v-2-only rows surface as history REWRITE
    back = {
        (r["cust_id"], r["change_type"])
        for r in scd2_version_diff(
            spark, dim_dir, "v-2", "v-0", key="cust_id",
            tracked=["segment"],
        ).collect()
    }
    assert (3, "delete") in back and (1, "delete") in back, back


def test_scd2_random_sequences_keep_invariants(spark):
    """Randomized SCD-2 invariant check: applying time-ordered update
    batches sequentially must always leave (per key) exactly one
    current row carrying the key's LATEST update value, a version
    count equal to 1 + number of value CHANGES (identical updates are
    no-ops), and a gap-free validity chain (each closed row's
    valid_to equals its successor's valid_from)."""
    import random

    from big_data_spark.operators.scd import scd2_apply

    for seed in (5, 17, 42):
        rng = random.Random(seed)
        keys = list(range(6))
        # 24 updates in time order: (key, value drawn from 3 choices)
        updates = [
            (rng.choice(keys), f"v{rng.randint(0, 2)}",
             f"2026-01-01T00:{i:02d}:00")
            for i in range(24)
        ]
        dim = (
            spark.createDataFrame(
                [(k, "v0", "2025-12-31T00:00:00") for k in keys],
                "k long, val string, ts_s string",
            )
            .select(
                "k",
                "val",
                F.to_timestamp("ts_s").alias("valid_from"),
                F.lit(None).cast("timestamp").alias("valid_to"),
                F.lit(True).alias("is_current"),
            )
        )
        # sequential batches of 6 updates, time-ordered
        for i in range(0, 24, 6):
            batch = spark.createDataFrame(
                [(k, v, t) for k, v, t in updates[i : i + 6]],
                "k long, val string, ts_s string",
            ).select("k", "val", F.to_timestamp("ts_s").alias("ts"))
            dim = scd2_apply(dim, batch, key="k", tracked=["val"]).localCheckpoint()

        rows = dim.collect()
        by_key: dict = {}
        for r in rows:
            by_key.setdefault(r["k"], []).append(r)

        # python replay of the semantics: per batch, latest update per
        # key applies; a version opens only when the value CHANGES
        state = {k: "v0" for k in keys}
        expected_versions = {k: 1 for k in keys}
        for i in range(0, 24, 6):
            latest: dict = {}
            for k, v, t in updates[i : i + 6]:
                latest[k] = v  # later in-batch update wins (ts ordered)
            for k, v in latest.items():
                if v != state[k]:
                    state[k] = v
                    expected_versions[k] += 1

        for k in keys:
            vers = sorted(by_key[k], key=lambda r: r["valid_from"])
            assert len(vers) == expected_versions[k], (seed, k, vers)
            cur = [r for r in vers if r["is_current"]]
            assert len(cur) == 1 and cur[0] is vers[-1]
            assert cur[0]["val"] == state[k], (seed, k)
            for a, b in zip(vers, vers[1:]):
                assert a["valid_to"] == b["valid_from"], (seed, k)
                assert not a["is_current"]
            assert vers[-1]["valid_to"] is None
