"""Persisted BM25 index: build/search parity with q137, bucket
partition pruning, streaming ingest (stream == one-shot build),
latest-wins re-ingest, and post-commit crash replay."""

from __future__ import annotations

import contextlib
import os

from big_data_spark.catalog import load_table
import pytest

from big_data_spark.operators.bm25_index import bm25_search, build_bm25_index
from big_data_spark.plans import formatted_plan
from big_data_spark.queries import QUERIES
from big_data_spark.streaming.sinks import (
    compact_bm25_index,
    start_bm25_ingest_stream,
)

from .conftest import SF_SMOKE

TERMS = ["spark", "hash", "window"]


def test_built_index_search_equals_q137(spark, tmp_path):
    """A search over the persisted index must return EXACTLY q137's
    inline ranking — same formula, same rounds, same tiebreak."""
    docs = load_table(spark, SF_SMOKE, "documents")
    idx = str(tmp_path / "idx")
    build_bm25_index(docs, idx)
    got = [tuple(r) for r in bm25_search(spark, idx, TERMS, k=10).collect()]
    want = [
        tuple(r) for r in QUERIES["q137_bm25_topk"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == want


def test_search_prunes_bucket_partitions(spark, tmp_path):
    """The postings scan must be DIRECTORY-pruned to the query terms'
    buckets — the bucket predicate appears in PartitionFilters, not
    as a post-scan filter over the whole index."""
    docs = load_table(spark, SF_SMOKE, "documents")
    idx = str(tmp_path / "idx")
    build_bm25_index(docs, idx)
    plan = formatted_plan(bm25_search(spark, idx, TERMS, k=10))
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("bucket" in ln for ln in pf), plan


def test_streaming_ingest_matches_one_shot_build(spark, tmp_path):
    """Index built from a third of the corpus + two streamed batches
    must search IDENTICALLY to a one-shot build over everything
    (corpus stats recompute from the live ledger, so streamed docs
    count in n_docs/avgdl/idf), and a post-commit crash replay
    changes nothing."""
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    )
    src = tmp_path / "src"
    src.mkdir()
    for name, pred in (("b", "doc_id % 3 = 1"), ("c", "doc_id % 3 = 2")):
        docs.filter(pred).coalesce(1).write.parquet(str(src / name))

    idx = str(tmp_path / "idx")
    build_bm25_index(docs.filter("doc_id % 3 = 0"), idx)

    full = str(tmp_path / "full")
    build_bm25_index(docs, full)

    ckpt = str(tmp_path / "ck")

    def run(ck):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = start_bm25_ingest_stream(stream, idx, ck)
        q.awaitTermination(180)

    run(ckpt)
    got = [tuple(r) for r in bm25_search(spark, idx, TERMS, k=10).collect()]
    want = [
        tuple(r) for r in bm25_search(spark, full, TERMS, k=10).collect()
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
        tuple(r) for r in bm25_search(spark, idx, TERMS, k=10).collect()
    ] == want

    # compaction folds all-but-newest batches into rewritten bases —
    # the search result must not move; a second compaction (nothing
    # left to fold) is a no-op
    assert compact_bm25_index(spark, idx) >= 1
    assert [
        tuple(r) for r in bm25_search(spark, idx, TERMS, k=10).collect()
    ] == want
    assert compact_bm25_index(spark, idx) == 0
    assert [
        tuple(r) for r in bm25_search(spark, idx, TERMS, k=10).collect()
    ] == want

    # a FRESH checkpoint against the folded layout must be rejected
    # (its restarted batch ids would collide with folded ids). A new
    # source file makes the fresh run deliver a non-empty batch (the
    # guard runs per non-empty batch).
    docs.filter("doc_id % 3 = 1").limit(5).coalesce(1).write.parquet(
        str(src / "d")
    )
    with pytest.raises(Exception, match="different[\\s\\S]*generation"):
        run(str(tmp_path / "ck_fresh"))


def test_crash_window_between_fold_flips_keeps_docs(spark, tmp_path):
    """Postings folded, doclen fold pending (a crash between the two
    manifest flips): every doc must keep matching — the ledger maps
    postings-folded batch ids to the base generation."""
    from big_data_spark.streaming.sinks import (
        BM25_POST_MANIFEST,
        _compact_stream_base,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    )
    src = tmp_path / "src"
    src.mkdir()
    for name, pred in (("b", "doc_id % 3 = 1"), ("c", "doc_id % 3 = 2")):
        docs.filter(pred).coalesce(1).write.parquet(str(src / name))
    idx = str(tmp_path / "idx")
    build_bm25_index(docs.filter("doc_id % 3 = 0"), idx)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = start_bm25_ingest_stream(stream, idx, str(tmp_path / "ck"))
    q.awaitTermination(180)
    want = [tuple(r) for r in bm25_search(spark, idx, TERMS, k=10).collect()]

    # fold ONLY the postings table (simulates the crash window)
    folded_n, _ = _compact_stream_base(
        spark,
        idx,
        manifest_name=BM25_POST_MANIFEST,
        stream_dir_name="postings_stream",
        leaf_pattern="batch_id=*",
        base_prefix="postings-v",
        plain_base="postings",
        id_col="doc_id",
        sidecar_dir=f"{idx}/doclen_stream",
        partition_by=("bucket",),
        keep_generation=True,
    )
    assert folded_n >= 1
    got = [tuple(r) for r in bm25_search(spark, idx, TERMS, k=10).collect()]
    assert got == want
    # the next full compaction completes the pair; still unchanged
    compact_bm25_index(spark, idx)
    assert [
        tuple(r) for r in bm25_search(spark, idx, TERMS, k=10).collect()
    ] == want


def test_reingest_latest_wins(spark, tmp_path):
    """A doc re-ingested WITHOUT a query term must stop matching it:
    generation resolution runs on the complete doclen ledger, where
    the pruned postings read alone could never see the drop."""
    base = spark.createDataFrame(
        [(1, "spark window join"), (2, "hash table scan")],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "idx")
    build_bm25_index(base, idx)
    assert {
        r["doc_id"] for r in bm25_search(spark, idx, ["spark"], k=10).collect()
    } == {1}

    # re-ingest doc 1 with "spark" REMOVED, via the streaming path
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, "window join only")], ["doc_id", "text"]
    ).coalesce(1).write.parquet(str(src / "a"))
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = start_bm25_ingest_stream(stream, idx, str(tmp_path / "ck"))
    q.awaitTermination(120)

    assert (
        bm25_search(spark, idx, ["spark"], k=10).collect() == []
    )
    # the doc still matches its surviving terms at the new generation
    assert {
        r["doc_id"]
        for r in bm25_search(spark, idx, ["window"], k=10).collect()
    } == {1}


def test_exact_duplicate_doc_rows_collapse(spark, tmp_path):
    """Exact duplicate input rows (the replay case) collapse to one
    doc — n_docs, dl fanout, and scores identical to the dup-free
    build; the review finding showed dups multiplied doc scores 7x."""
    rows = [(1, "spark window join"), (2, "hash table scan")]
    clean = str(tmp_path / "clean")
    build_bm25_index(spark.createDataFrame(rows, ["doc_id", "text"]), clean)
    duped = str(tmp_path / "duped")
    build_bm25_index(
        spark.createDataFrame(rows + rows[:1], ["doc_id", "text"]), duped
    )
    want = [tuple(r) for r in bm25_search(spark, clean, ["spark"]).collect()]
    got = [tuple(r) for r in bm25_search(spark, duped, ["spark"]).collect()]
    assert got == want


def test_conflicting_texts_for_one_doc_fail_loudly(spark, tmp_path):
    """Two DIFFERENT texts under one doc_id in one generation is a
    data bug — no arbitrary winner, the build must raise."""
    df = spark.createDataFrame(
        [(1, "spark window"), (1, "different text"), (2, "hash scan")],
        ["doc_id", "text"],
    )
    with pytest.raises(Exception, match="conflicting texts"):
        build_bm25_index(df, str(tmp_path / "idx"))


def test_null_text_fails_loudly(spark, tmp_path):
    """NULL text must be rejected at the boundary (ADVICE r06): it
    would yield zero postings but a NULL dl — counted in n_docs yet
    excluded from avgdl — silently skewing corpus stats for every
    query. And (id, NULL) + (id, 'x') must NOT silently resolve to
    'x': the NULL-ignoring count_distinct would have called that one
    value; the coalesced-sentinel count calls it a conflict."""
    only_null = spark.createDataFrame(
        [(1, None), (2, "hash scan")], "doc_id int, text string"
    )
    with pytest.raises(Exception, match="NULL text"):
        build_bm25_index(only_null, str(tmp_path / "idx_a"))

    null_plus_text = spark.createDataFrame(
        [(1, None), (1, "spark window"), (2, "hash scan")],
        "doc_id int, text string",
    )
    with pytest.raises(Exception, match="conflicting texts"):
        build_bm25_index(null_plus_text, str(tmp_path / "idx_b"))


def test_rebuild_over_streamed_dir_refused(spark, tmp_path):
    """build_bm25_index into a dir carrying stream state must raise:
    readers resolve the manifest's versioned base and surviving
    stream batches would shadow the fresh plain base (stale index,
    silently)."""
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "idx")
    build_bm25_index(docs.filter("doc_id % 2 = 0"), idx)
    src = tmp_path / "src"
    src.mkdir()
    docs.filter("doc_id % 2 = 1").coalesce(1).write.parquet(str(src / "a"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = start_bm25_ingest_stream(stream, idx, str(tmp_path / "ck"))
    q.awaitTermination(120)
    with pytest.raises(RuntimeError, match="streaming/compaction state"):
        build_bm25_index(docs, idx)
