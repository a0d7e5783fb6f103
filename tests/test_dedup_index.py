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
