"""Persisted BM25 inverted index: build / search / streaming ingest.

The sparse-retrieval sibling of the dense-index surface in
operators/similarity.py (IVF/PQ): q137 computes BM25 inline per query
— correct, but a production search path doesn't re-tokenize 100 TB
per query. This module makes the index something you OPERATE:

  <path>/postings/        (term, doc_id, tf) parquet, partitioned by
                          ``bucket`` = md5-derived term bucket — a
                          query's read is DIRECTORY-PRUNED to its
                          terms' buckets (PartitionFilters,
                          plan-asserted), ~K/n_buckets of the index
  <path>/doclen/          (doc_id, dl) parquet — the doc-level length
                          table; also the generation ledger for
                          latest-wins (see below)
  <path>/postings_stream/ per-batch postings partials, partitioned by
                          (batch_id, bucket) — exactly-once via
                          dynamic partition overwrite
  <path>/doclen_stream/   per-batch doclen partials (batch_id)
  <path>/meta.json        {n_buckets, k1, b} — layout contract only;
                          corpus statistics are always recomputed
                          from the live doclen table so streamed docs
                          count

Latest-wins re-ingest: a doc re-ingested in a later batch REPLACES
its earlier postings. The doc's current generation is resolved on the
DOCLEN table (complete per doc — a pruned postings read alone cannot
see that a re-ingested version dropped a query term), and postings
join that (doc_id, batch_id) ledger; base rows carry generation -1.

Scoring matches q137's `_bm25_doc_scores` formula term for term
(Okapi k1=1.2 b=0.75, Lucene non-negative idf, per-term rounds to 8,
exact-decimal per-doc sum rounded 6), so `bm25_search` over a
freshly-built index returns EXACTLY q137's ranking — pinned by test.

Reference behavior: PucDev2010/big-data has no retrieval index; this
extends the engine the same way the IVF surface does (SURVEY §2 LLM
operators).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

K1 = 1.2
B = 0.75


def _bucket_col(term: Column, n_buckets: int) -> Column:
    """md5-derived term bucket — Spark-side twin of _bucket_py."""
    return (
        F.conv(F.substring(F.md5(term), 1, 4), 16, 10).cast("long")
        % n_buckets
    ).cast("int")


def _bucket_py(term: str, n_buckets: int) -> int:
    """Driver-side bucket for query-term partition pruning. MUST
    match _bucket_col: both read the first 4 hex chars of md5."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:4], 16) % (
        n_buckets
    )


def _postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(text_col, " ")).alias("term"),
    )
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def _doclen(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # size(split) counts exactly the tokens the postings explode
    # emits — one map-only pass, no second explode
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(text_col, " ")).cast("long").alias("dl"),
    )


def build_bm25_index(
    docs: DataFrame,
    path: str,
    *,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One-shot index build: postings bucket-partitioned for query
    pruning, doclen as the doc ledger, meta.json as the layout
    contract. The build is two corpus passes (postings agg + the
    map-only doclen projection); everything shuffles on doc/term
    keys, never bodies."""
    p = _postings(docs, id_col, text_col).withColumn(
        "bucket", _bucket_col(F.col("term"), n_buckets)
    )
    p.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(path, "postings")
    )
    _doclen(docs, id_col, text_col).write.mode("overwrite").parquet(
        os.path.join(path, "doclen")
    )
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"n_buckets": n_buckets, "k1": K1, "b": B}, f)


def start_bm25_ingest_stream(
    docs_stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Streaming corpus → index maintenance: each micro-batch lands
    its postings (bucketed like the base) and doclen partials in
    their own batch_id partitions — replays overwrite their own
    partition with identical content (the start_rollup_stream
    exactly-once contract). A doc re-ingested in a later batch
    supersedes its earlier generation at READ time (latest-wins on
    the doclen ledger), so updates need no base rewrite until a
    compaction folds them in."""
    meta = _read_meta(path)
    n_buckets = meta["n_buckets"]

    def write_partial(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        (
            _postings(batch, id_col, text_col)
            .withColumn("bucket", _bucket_col(F.col("term"), n_buckets))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "bucket")
            .parquet(os.path.join(path, "postings_stream"))
        )
        (
            _doclen(batch, id_col, text_col)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(os.path.join(path, "doclen_stream"))
        )

    writer = (
        docs_stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


def _live_doclen(spark: SparkSession, path: str) -> DataFrame:
    """(doc_id, dl, batch_id) with latest-wins resolved: one row per
    doc at its newest generation (base = -1). This is the complete
    doc ledger — generation resolution must happen HERE, not on a
    term-pruned postings read, because a re-ingested doc that DROPPED
    a query term is invisible to the pruned read."""
    base = (
        spark.read.parquet(os.path.join(path, "doclen"))
        .withColumn("batch_id", F.lit(-1).cast("long"))
    )
    stream_dir = os.path.join(path, "doclen_stream")
    if os.path.isdir(stream_dir):
        stream = spark.read.parquet(stream_dir).select(
            "doc_id", "dl", F.col("batch_id").cast("long")
        )
        base = base.unionByName(stream)
    w = Window.partitionBy("doc_id")
    return (
        base.withColumn("_mx", F.max("batch_id").over(w))
        .filter(F.col("batch_id") == F.col("_mx"))
        .drop("_mx")
    )


def bm25_search(
    spark: SparkSession,
    path: str,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Top-k BM25 over the persisted index. Reads ONLY the query
    terms' bucket partitions (directory pruning — the scan's
    PartitionFilters carry the bucket isin, plan-asserted), resolves
    doc generations on the doclen ledger, recomputes corpus stats
    from the live ledger (so streamed docs count), and scores with
    q137's exact formula. Returns (doc_id, bm25) ordered
    (bm25 DESC, doc_id), k rows via TakeOrderedAndProject."""
    meta = _read_meta(path)
    n_buckets = meta["n_buckets"]
    buckets = sorted({_bucket_py(t, n_buckets) for t in terms})

    post = (
        spark.read.parquet(os.path.join(path, "postings"))
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .select("doc_id", "term", "tf", F.lit(-1).cast("long").alias("batch_id"))
    )
    stream_dir = os.path.join(path, "postings_stream")
    if os.path.isdir(stream_dir):
        post = post.unionByName(
            spark.read.parquet(stream_dir)
            .filter(F.col("bucket").isin(buckets))
            .filter(F.col("term").isin(terms))
            .select(
                "doc_id", "term", "tf", F.col("batch_id").cast("long")
            )
        )

    dl = _live_doclen(spark, path).localCheckpoint()
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    # keep only postings of each doc's live generation
    tf = post.join(dl.select("doc_id", "batch_id"), ["doc_id", "batch_id"])

    df_ = tf.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    idf = df_.crossJoin(F.broadcast(stats)).select(
        "term",
        F.round(
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1
            ),
            8,
        ).alias("idf"),
    )
    s_term = F.round(
        F.col("idf")
        * (F.col("tf") * 2.2)
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))),
        8,
    )
    return (
        tf.join(F.broadcast(idf), "term")
        .join(dl.select("doc_id", "dl"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", s_term.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("s").cast("decimal(27,8)")).cast("double"), 6
            ).alias("bm25")
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )
