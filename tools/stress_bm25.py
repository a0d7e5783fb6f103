"""Persisted-BM25-index stress harness: build + pruned search at
500k docs / ~30M tokens (~100x the sf0.1 documents table).

Same deterministic corpus generator as tools/stress_dedup.py (minus
the planted dups — retrieval wants distinct docs). Measures, one
JSON line each:

  bm25_build     build_bm25_index(n_buckets=64): dedup boundary +
                 postings (bucket-partitioned) + doclen + meta
  bm25_search    median latency over 5 three-term queries on the
                 persisted index — the read is directory-pruned to
                 the query terms' buckets (<= 3/64 of the postings
                 tree) and corpus stats recompute from the doclen
                 ledger
  inline_score   the same query WITHOUT the index: re-tokenize the
                 full corpus, filter to the query terms, aggregate —
                 what every query pays when retrieval has no
                 persisted index (the q137 shape, which is correct
                 for one-off analytics and wrong for serving)
  bm25_ingest    stream 20% more docs into the live index in 10
                 micro-batches (file source, availableNow) — docs/s
                 through the exactly-once batch-partial write path
  search_merged  search latency over base + 10 uncompacted stream
                 batches (the read path pays the fold-merge)
  bm25_compact   compact_bm25_index: fold finalized batches into
                 rewritten bases behind the two atomic manifest flips
  search_folded  search latency after compaction — the fold-merge
                 cost reclaimed

Usage: python tools/stress_bm25.py [n_docs] [n_tokens] [vocab]
Defaults 500_000 x 60, 50k vocab. Single-shot timings on cache-
warmed inputs — scale datapoints, not benchmarks.
"""

from __future__ import annotations

import json
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from big_data_spark.operators.bm25_index import (
    bm25_search,
    build_bm25_index,
)
from big_data_spark.session import get_spark

QUERIES = [
    ["t17", "t4242", "t31337"],
    ["t100", "t200", "t300"],
    ["t999", "t1234", "t48000"],
    ["t5", "t2718", "t14142"],
    ["t42", "t424", "t4242"],
]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000

    spark = get_spark("stress-bm25")

    tok = lambda p: F.concat(  # noqa: E731
        F.lit("t"),
        F.pmod(F.xxhash64(F.col("id") * 131 + p), F.lit(vocab)).cast("string"),
    )
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(F.sequence(F.lit(0), F.lit(n_tokens - 1)), tok),
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    n = docs.count()
    print(json.dumps({"corpus": {"docs": n, "tokens_per_doc": n_tokens,
                                 "vocab": vocab}}), flush=True)

    # base = first 80%, streamed tail = last 20% (10 micro-batches)
    n_base = int(n_docs * 0.8)
    base_docs = docs.filter(F.col("doc_id") < n_base)
    tail_docs = docs.filter(F.col("doc_id") >= n_base)

    path = tempfile.mkdtemp(prefix="stress_bm25_")
    t0 = time.perf_counter()
    build_bm25_index(base_docs, path, n_buckets=64)
    print(json.dumps({"op": "bm25_build", "n_buckets": 64,
                      "wall_s": round(time.perf_counter() - t0, 2)}), flush=True)

    times = []
    top1 = None
    for terms in QUERIES:
        t0 = time.perf_counter()
        rows = bm25_search(spark, path, terms, k=10).collect()
        times.append(time.perf_counter() - t0)
        top1 = rows[0]["doc_id"] if rows else None
    print(json.dumps({"op": "bm25_search", "queries": len(QUERIES),
                      "median_s": round(statistics.median(times), 3),
                      "last_top1": top1}), flush=True)

    # the no-index cost: full corpus re-tokenize per query
    terms = QUERIES[0]
    t0 = time.perf_counter()
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    n_hits = tf.count()
    print(json.dumps({"op": "inline_score", "note": "tf stage only, full re-tokenize",
                      "wall_s": round(time.perf_counter() - t0, 2),
                      "tf_rows": n_hits}), flush=True)

    # streaming ingest: the tail lands in 10 micro-batches
    from big_data_spark.streaming.sinks import (
        compact_bm25_index,
        start_bm25_ingest_stream,
    )

    src = tempfile.mkdtemp(prefix="stress_bm25_src_")
    tail_docs.repartition(10).write.mode("overwrite").parquet(src)
    n_tail = tail_docs.count()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ckpt = tempfile.mkdtemp(prefix="stress_bm25_ckpt_")
    t0 = time.perf_counter()
    q = start_bm25_ingest_stream(stream, path, ckpt)
    q.awaitTermination(600)
    ingest_s = time.perf_counter() - t0
    print(json.dumps({"op": "bm25_ingest", "docs": n_tail, "batches": 10,
                      "wall_s": round(ingest_s, 2),
                      "docs_per_s": round(n_tail / ingest_s, 1)}), flush=True)

    times = []
    for terms in QUERIES:
        t0 = time.perf_counter()
        bm25_search(spark, path, terms, k=10).collect()
        times.append(time.perf_counter() - t0)
    print(json.dumps({"op": "search_merged",
                      "median_s": round(statistics.median(times), 3)}), flush=True)

    t0 = time.perf_counter()
    folded = compact_bm25_index(spark, path)
    print(json.dumps({"op": "bm25_compact", "batches_folded": folded,
                      "wall_s": round(time.perf_counter() - t0, 2)}), flush=True)

    times = []
    for terms in QUERIES:
        t0 = time.perf_counter()
        bm25_search(spark, path, terms, k=10).collect()
        times.append(time.perf_counter() - t0)
    print(json.dumps({"op": "search_folded",
                      "median_s": round(statistics.median(times), 3)}), flush=True)
    # every datapoint above is already flushed — this marker tells a
    # reader the run is complete even if the large-state JVM teardown
    # below takes a while (observed minutes at 1M-row scale)
    print(json.dumps({"done": True}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
