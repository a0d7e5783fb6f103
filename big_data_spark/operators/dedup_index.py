"""Incremental dedup against a persistent fingerprint index — the
daily-ingest form of exact dedup.

The batch queries dedup a corpus against itself (q43 fingerprint,
q66 fixpoint LSH); a production pipeline also needs "is this NEW
batch a duplicate of anything we already ingested?" without
rescanning the corpus. The index holds one 16-byte md5 per kept
document (~10^9 rows per 100 TB of docs — a few GB of digests, i.e.
0.01% of the corpus), so the check is a digest-keyed anti-join that
never touches historical document bodies.

Flow per ingest batch:
  survivors = dedup_against_index(batch, index)   # anti-join + self-dedup
  append_fingerprints(survivors, index_dir)       # index grows by the kept set

Shuffle cost: one hash shuffle of the batch's digests against the
index digests (sort-merge or shuffled-hash on 16-byte keys). The
index side is pre-shuffle-free if bucketed by fingerprint
(operators/relational.write_bucketed) — then only the new batch moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FINGERPRINT_COL = "fingerprint"


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalize -> md5 content digest (built from the shared
    corpus_gates.content_fingerprint expression, so batch dedup,
    incremental dedup, and the streaming ingest sink agree on what
    "identical" means)."""
    from .corpus_gates import content_fingerprint

    return df.withColumn(FINGERPRINT_COL, content_fingerprint(text_col))


def dedup_against_index(
    batch: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``batch`` that duplicate neither the index nor each
    other. Within-batch ties keep the smallest id (deterministic,
    retry-stable). Returns the surviving rows WITH their fingerprint
    column so the caller can append them to the index."""
    fp = fingerprint(batch, text_col)
    # NULL text -> NULL fingerprint: content-undedupable by
    # definition, and a NULL key never matches the anti-join, so such
    # a row would survive EVERY batch and grow the index with NULL
    # digests forever. Policy: drop them here (the streaming path's
    # quality gates already exclude null text before this point).
    fp = fp.filter(F.col(FINGERPRINT_COL).isNotNull())
    fresh = fp.join(
        index.select(FINGERPRINT_COL), FINGERPRINT_COL, "left_anti"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(FINGERPRINT_COL).orderBy(id_col)
    return (
        fresh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def append_fingerprints(survivors: DataFrame, index_dir: str) -> None:
    """Grow the index by the kept set (append-only: a fingerprint is
    written once, by the batch that first kept it)."""
    survivors.select(FINGERPRINT_COL).write.mode("append").parquet(index_dir)


def read_index(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(index_dir)


def read_index_or_empty(spark: SparkSession, index_dir: str) -> DataFrame:
    """The index, or an empty one iff the index genuinely does not
    exist yet (first batch: directory absent, or present with no
    committed data files — a killed first ``append_fingerprints`` can
    leave only ``_temporary``).

    Deliberately narrow: any OTHER failure (transient IO error,
    corrupt/truncated part file) propagates so the caller's batch
    fails and checkpoint replay retries. Swallowing those would
    silently disable dedup for the batch and permanently ingest
    duplicates — the index IS the dedup state.
    """
    import os

    if "://" in index_dir and not index_dir.startswith("file:"):
        # the local os.path probe would report a REMOTE index (s3://,
        # hdfs://) as absent and silently disable dedup — exactly the
        # failure this function exists to prevent. This module's
        # manifest/probe machinery is local-filesystem by design; use
        # a Hadoop-FS-backed table format for object stores.
        raise ValueError(
            f"read_index_or_empty requires a local path, got {index_dir!r}"
        )
    # os.path cannot resolve a file: URI — probe the plain path, but
    # keep the original (Spark accepts any form) for the read. Hadoop
    # renders local URIs as file:/p, file:///p, or file://p — strip
    # the scheme and collapse leading slashes to the absolute path.
    probe_dir = index_dir
    if probe_dir.startswith("file:"):
        probe_dir = probe_dir[len("file:") :]
        while probe_dir.startswith("//"):
            probe_dir = probe_dir[1:]
    has_data = os.path.isdir(probe_dir) and any(
        not n.startswith(("_", ".")) for n in os.listdir(probe_dir)
    )
    if not has_data:
        return spark.createDataFrame([], f"{FINGERPRINT_COL} string")
    return read_index(spark, index_dir)
