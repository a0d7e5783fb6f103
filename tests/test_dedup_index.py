"""Incremental dedup against a persistent fingerprint index: two
ingest batches must end in exactly the state a single batch dedup of
their union would produce (incremental == batch, the invariant that
makes daily ingest trustworthy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_spark.catalog import load_table
from big_data_spark.operators.dedup_index import (
    append_fingerprints,
    dedup_against_index,
    fingerprint,
    read_index,
)

from .conftest import SF_ORACLE


def test_incremental_equals_batch_dedup(spark, tmp_path):
    docs = load_table(spark, SF_ORACLE, "documents")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs  # second batch re-sends everything (at-least-once ingest)

    index_dir = str(tmp_path / "fp_index")
    empty_index = fingerprint(docs).select("fingerprint").limit(0)

    s1 = dedup_against_index(b1, empty_index)
    append_fingerprints(s1, index_dir)
    s2 = dedup_against_index(b2, read_index(spark, index_dir))
    append_fingerprints(s2, index_dir)

    kept_incremental = {r["doc_id"] for r in s1.select("doc_id").collect()} | {
        r["doc_id"] for r in s2.select("doc_id").collect()
    }

    # batch reference: union in arrival order = batch1 ids first, so
    # replay q43's keep-min-per-fingerprint over (b1 ids, then b2-only
    # ids) — a doc in b1 wins its fingerprint group even if a smaller
    # doc_id arrives only in b2
    fp = fingerprint(docs).select("doc_id", "fingerprint")
    b1_ids = {r["doc_id"] for r in b1.select("doc_id").collect()}
    groups: dict[str, list[int]] = {}
    for r in fp.collect():
        groups.setdefault(r["fingerprint"], []).append(r["doc_id"])
    expected = set()
    for ids in groups.values():
        first_batch = sorted(i for i in ids if i in b1_ids)
        expected.add(first_batch[0] if first_batch else min(ids))
    assert kept_incremental == expected

    # index holds exactly one fingerprint per kept doc, no dupes
    idx = read_index(spark, index_dir)
    assert idx.count() == idx.distinct().count() == len(expected)


def test_dedup_against_index_is_digest_keyed(spark):
    """The anti-join must key on the 16-byte digest — a hash/merge
    join, never a nested loop over document bodies."""
    docs = load_table(spark, SF_ORACLE, "documents")
    idx = fingerprint(docs.limit(100)).select("fingerprint")
    out = dedup_against_index(docs, idx)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_streaming_corpus_ingest_dedups_via_index(spark, tmp_path):
    """Gates + persistent-index dedup as a streaming sink: duplicates
    drop across micro-batches AND across a full source replay on a
    fresh checkpoint (the index is the state, not the stream)."""
    from big_data_spark.catalog import load_table
    from big_data_spark.streaming.sinks import start_corpus_ingest_stream

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    src = tmp_path / "src"
    src.mkdir()
    # batch a: docs 0..249; batch b: 200..299 (dupes) + shifted ids of
    # the same texts (content dupes under new ids) + docs 300..449
    a = docs.filter("doc_id < 250")
    b = docs.filter("doc_id >= 200 AND doc_id < 450").union(
        docs.filter("doc_id < 50").selectExpr("doc_id + 10000 AS doc_id", "text")
    )
    a.coalesce(1).write.parquet(str(src / "a"))
    b.coalesce(1).write.parquet(str(src / "b"))

    out_dir, index_dir = str(tmp_path / "out"), str(tmp_path / "index")

    def run(ckpt: str):
        stream = (
            spark.readStream.schema(a.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_corpus_ingest_stream(stream, out_dir, index_dir, ckpt)
        q.awaitTermination(180)

    run(str(tmp_path / "c1"))
    out = spark.read.parquet(out_dir)
    n1 = out.count()
    # every fingerprint exactly once, and the gated batch equivalent
    # (self-dedup of a+b) has the same fingerprint set
    from big_data_spark.streaming import corpus_quality_gates

    want_fps = {
        r["fp"]
        for r in corpus_quality_gates(a.union(b)).select("fp").collect()
    }
    assert {r["fingerprint"] for r in out.collect()} == want_fps
    assert n1 == len(want_fps)

    # full replay on a FRESH checkpoint: the index makes it a no-op
    run(str(tmp_path / "c2"))
    assert spark.read.parquet(out_dir).count() == n1


def test_read_index_or_empty_narrow_fallback(spark, tmp_path):
    """Empty-index fallback fires ONLY when the index genuinely does
    not exist (absent dir, or dir with no committed data files); a
    corrupt part file must raise, never read as empty."""
    from big_data_spark.operators.dedup_index import read_index_or_empty

    # absent directory -> empty frame with the index schema
    missing = read_index_or_empty(spark, str(tmp_path / "nope"))
    assert missing.columns == ["fingerprint"]
    assert missing.count() == 0

    # dir with only uncommitted/hidden entries (killed first append)
    partial = tmp_path / "partial"
    (partial / "_temporary").mkdir(parents=True)
    assert read_index_or_empty(spark, str(partial)).count() == 0

    # committed-looking but corrupt data file -> propagate, don't
    # silently disable dedup
    corrupt = tmp_path / "corrupt"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"not a parquet file")
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_index_or_empty(spark, str(corrupt)).count()


def test_read_index_or_empty_file_uri(spark, tmp_path):
    """A file:// URI is a LOCAL path: the existence probe must strip
    the scheme (os.path cannot resolve URIs) — otherwise a populated
    index reads as absent and dedup is silently disabled — while a
    remote scheme still raises."""
    from big_data_spark.operators.dedup_index import (
        append_fingerprints,
        read_index_or_empty,
    )

    idx = tmp_path / "idx"
    fps = spark.createDataFrame([("a",), ("b",)], "fingerprint string")
    append_fingerprints(fps, str(idx))
    # both local-URI renderings Hadoop/Spark emit for an absolute
    # path: file:/p (canonical Path.toString) and file:///p (the
    # common scheme://-style spelling)
    for uri in (f"file:{idx}", f"file://{idx}"):
        assert read_index_or_empty(spark, uri).count() == 2, uri

    # absent file: paths -> empty frame, same as the plain-path form
    assert read_index_or_empty(spark, f"file://{tmp_path}/nope").count() == 0
    assert read_index_or_empty(spark, f"file:{tmp_path}/nope").count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="local path"):
        read_index_or_empty(spark, "s3://bucket/idx")


def test_streaming_corpus_ingest_fails_on_corrupt_index(spark, tmp_path):
    """A later batch whose index read fails must FAIL the batch (so
    checkpoint replay retries) instead of treating the index as empty
    and permanently ingesting duplicates."""
    from big_data_spark.streaming.sinks import start_corpus_ingest_stream

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    src = tmp_path / "src"
    src.mkdir()
    docs.filter("doc_id < 100").coalesce(1).write.parquet(str(src / "a"))

    out_dir, index_dir = str(tmp_path / "out"), str(tmp_path / "index")

    def run(ckpt: str):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_corpus_ingest_stream(stream, out_dir, index_dir, ckpt)
        q.awaitTermination(180)

    run(str(tmp_path / "c1"))
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    # corrupt every committed index file, then replay the same source
    # on a fresh checkpoint: with a swallowed read error this would
    # re-ingest all n1 docs; with the narrow fallback it must raise
    import os

    for name in os.listdir(index_dir):
        if not name.startswith(("_", ".")):
            with open(os.path.join(index_dir, name), "wb") as f:
                f.write(b"garbage")
    import pytest as _pytest

    with _pytest.raises(Exception):
        run(str(tmp_path / "c2"))
    assert spark.read.parquet(out_dir).count() == n1  # nothing re-ingested


def test_streaming_corpus_ingest_resumes_incrementally(spark, tmp_path):
    """New files arriving after a checkpointed run are processed
    incrementally on resume: only genuinely new content lands, and
    already-ingested fingerprints stay deduped."""
    from big_data_spark.catalog import load_table
    from big_data_spark.streaming.sinks import start_corpus_ingest_stream

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    src = tmp_path / "src"
    src.mkdir()
    docs.filter("doc_id < 200").coalesce(1).write.parquet(str(src / "a"))

    out_dir, index_dir = str(tmp_path / "out"), str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_corpus_ingest_stream(stream, out_dir, index_dir, ckpt)
        q.awaitTermination(180)

    run()
    n1 = spark.read.parquet(out_dir).count()

    # second wave: half duplicates of wave 1, half new docs
    docs.filter("doc_id >= 100 AND doc_id < 300").coalesce(1).write.parquet(
        str(src / "b")
    )
    run()  # SAME checkpoint: resumes from the WAL, processes only file b
    out = spark.read.parquet(out_dir)
    n2 = out.count()
    assert n2 > n1  # the genuinely new docs landed
    fps = [r["fingerprint"] for r in out.collect()]
    assert len(fps) == len(set(fps))  # still exactly-once per content


def test_streaming_chunk_ingest_dedups_chunk_content(spark, tmp_path):
    """Stride chunking + persistent-index chunk dedup as a streaming
    sink: duplicate chunk CONTENT drops across micro-batches (shared
    segments between near-duplicate docs land once), and a full
    source replay on a fresh checkpoint is a no-op — the chunk store
    equals the batch chunker's distinct-content set."""
    from pyspark.sql import functions as F

    from big_data_spark.catalog import load_table
    from big_data_spark.operators.chunking import stride_chunks
    from big_data_spark.streaming.sinks import start_chunk_ingest_stream

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    src = tmp_path / "src"
    src.mkdir()
    a = docs.filter("doc_id < 150")
    # batch b repeats 50 docs verbatim under new ids + brings new docs
    b = docs.filter("doc_id >= 150 AND doc_id < 300").union(
        docs.filter("doc_id < 50").selectExpr("doc_id + 9000 AS doc_id", "text")
    )
    a.coalesce(1).write.parquet(str(src / "a"))
    b.coalesce(1).write.parquet(str(src / "b"))

    out_dir, index_dir = str(tmp_path / "out"), str(tmp_path / "index")

    def run(ckpt: str):
        stream = (
            spark.readStream.schema(a.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_chunk_ingest_stream(stream, out_dir, index_dir, ckpt)
        q.awaitTermination(180)

    run(str(tmp_path / "c1"))
    out = spark.read.parquet(out_dir)
    batch_chunks = stride_chunks(
        a.union(b).select("doc_id", F.split("text", " ").alias("t")), "doc_id", "t"
    ).select(F.md5(F.concat_ws(" ", "chunk")).alias("h"))
    want = {r["h"] for r in batch_chunks.distinct().collect()}
    got = [r["fingerprint"] for r in out.select("fingerprint").collect()]
    assert set(got) == want and len(got) == len(want)

    # replay on a fresh checkpoint: index makes it a no-op
    run(str(tmp_path / "c2"))
    assert spark.read.parquet(out_dir).count() == len(want)


def test_streaming_chunk_ingest_fails_on_corrupt_index(spark, tmp_path):
    """Chunk-store sink mirror of the corpus-ingest guarantee: a
    later batch whose chunk-index read fails must FAIL the batch so
    checkpoint replay retries — never treat the index as empty and
    re-ingest every chunk."""
    import os

    from big_data_spark.streaming.sinks import start_chunk_ingest_stream

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    src = tmp_path / "src"
    src.mkdir()
    docs.filter("doc_id < 60").coalesce(1).write.parquet(str(src / "a"))

    out_dir, index_dir = str(tmp_path / "out"), str(tmp_path / "index")

    def run(ckpt: str):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_chunk_ingest_stream(stream, out_dir, index_dir, ckpt)
        q.awaitTermination(180)

    run(str(tmp_path / "c1"))
    assert spark.read.parquet(out_dir).count() > 0

    for name in os.listdir(index_dir):
        if not name.startswith(("_", ".")):
            with open(os.path.join(index_dir, name), "wb") as f:
                f.write(b"garbage")
    import pytest as _pytest

    with _pytest.raises(Exception):
        run(str(tmp_path / "c2"))
