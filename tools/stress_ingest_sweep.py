"""Ingest-throughput-vs-batch-size sweep for the streaming index
sinks (VERDICT r07 order #3): the r07 lifecycles measured IVF ingest
at 2.3k vec/s and BM25 at 3.4k docs/s with 10 micro-batches and
attributed the ceiling to PER-BATCH fixed cost (dedup boundary + two
dynamic-partition writes per micro-batch) — this harness measures the
claim instead of asserting it. Same corpus, same tail, swept over
micro-batch counts: if the fixed-cost theory holds, wall time is
~linear in batch count at fixed volume and docs-or-vecs/s rises
toward the per-row floor as batches grow.

For each family (IVF vectors, residual IVFPQ vectors, BM25 docs):
  - build the base index once on 80% of the corpus
  - for each batch count b: copy the index to a fresh dir, land the
    20% tail as exactly b files, stream with maxFilesPerTrigger=1
    (b micro-batches), report wall seconds and rows/s — one JSON
    line per point

Usage: python tools/stress_ingest_sweep.py [n_vecs] [n_docs]
                                           [batch_counts...]
Defaults 200_000 vectors (dim 32, nlist 64), 200_000 docs (60
tokens, 50k vocab), sweep 2 5 10 20. Deterministic xxhash64
generators (the stress_dedup/stress_ann corpora). Single-shot
timings on cache-warmed inputs — scale datapoints, not benchmarks.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from big_data_spark.operators.bm25_index import build_bm25_index
from big_data_spark.operators.similarity import (
    build_ivf_index,
    save_ivf_index,
)
from big_data_spark.session import get_spark
from big_data_spark.streaming.sinks import (
    start_bm25_ingest_stream,
    start_vector_ingest_stream,
)


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    sweep = [int(a) for a in sys.argv[3:]] or [2, 5, 10, 20]
    dim, nlist = 32, 64
    n_tokens, vocab = 60, 50_000

    spark = get_spark("stress-ingest-sweep")

    # ---- IVF family (stress_ann's clustered corpus) ----
    def comp(seed_col, i, scale):
        return (
            F.pmod(F.xxhash64(seed_col * 1_000_003 + i), F.lit(2000)).cast(
                "double"
            )
            / 1000.0
            - 1.0
        ) * scale

    center = F.col("id") % nlist
    emb = (
        spark.range(n_vecs)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.round(
                    comp(center, i, F.lit(1.0))
                    + comp(F.col("id"), i, F.lit(0.125)),
                    6,
                ).cast("float"),
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    n_base = int(n_vecs * 0.8)
    tail = emb.filter(F.col("vec_id") >= n_base)
    n_tail = tail.count()
    base_path = tempfile.mkdtemp(prefix="sweep_ivf_base_")
    save_ivf_index(
        build_ivf_index(emb.filter(F.col("vec_id") < n_base), nlist=nlist),
        base_path,
    )
    print(
        json.dumps(
            {"corpus": {"vectors": n_vecs, "tail": n_tail, "dim": dim}}
        ),
        flush=True,
    )

    for b in sweep:
        src = tempfile.mkdtemp(prefix=f"sweep_ivf_src{b}_")
        tail.repartition(b).write.mode("overwrite").parquet(src)
        live = tempfile.mkdtemp(prefix=f"sweep_ivf_live{b}_")
        shutil.rmtree(live)
        shutil.copytree(base_path, live)
        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        ckpt = tempfile.mkdtemp(prefix=f"sweep_ivf_ckpt{b}_")
        t0 = time.perf_counter()
        q = start_vector_ingest_stream(stream, live, ckpt)
        if not q.awaitTermination(900):
            q.stop()
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": "ivf_ingest_sweep",
                    "batches": b,
                    "vectors": n_tail,
                    "wall_s": round(wall, 2),
                    "vecs_per_s": round(n_tail / wall, 1),
                    "s_per_batch": round(wall / b, 2),
                }
            ),
            flush=True,
        )
        for d in (src, live, ckpt):
            shutil.rmtree(d, ignore_errors=True)

    # ---- residual (IVFPQ) family (VERDICT r08 order #3): the
    # residual sink is ENCODE-BOUND (r08 lifecycle: 788 vec/s at 10
    # batches), a different regime from the fixed-cost-bound IVF/BM25
    # sinks — sweeping batch counts at fixed volume separates the
    # per-batch fixed cost (slope of wall vs batches) from the
    # per-row encode floor, which the batch-encode datapoint below
    # pins directly (same encoder, no streaming machinery) ----
    from big_data_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_encode_frame,
        save_ivfpq_index,
    )
    from big_data_spark.streaming.sinks import start_pq_ingest_stream

    m, ksub = 4, 256
    pq_base = tempfile.mkdtemp(prefix="sweep_ivfpq_base_")
    ivfpq = build_ivfpq_index(
        emb.filter(F.col("vec_id") < n_base), nlist=nlist, m=m, ksub=ksub
    )
    save_ivfpq_index(ivfpq, pq_base)

    t0 = time.perf_counter()
    ivfpq_encode_frame(tail, ivfpq.centroids, ivfpq.codebooks).write.mode(
        "overwrite"
    ).parquet(tempfile.mkdtemp(prefix="sweep_enc_"))
    enc_wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "op": "ivfpq_encode_batch",
                "vectors": n_tail,
                "m": m,
                "ksub": ksub,
                "wall_s": round(enc_wall, 2),
                "us_per_vec": round(enc_wall / n_tail * 1e6, 1),
            }
        ),
        flush=True,
    )

    for b in sweep:
        src = tempfile.mkdtemp(prefix=f"sweep_ivfpq_src{b}_")
        tail.repartition(b).write.mode("overwrite").parquet(src)
        live = tempfile.mkdtemp(prefix=f"sweep_ivfpq_live{b}_")
        shutil.rmtree(live)
        shutil.copytree(pq_base, live)
        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        ckpt = tempfile.mkdtemp(prefix=f"sweep_ivfpq_ckpt{b}_")
        t0 = time.perf_counter()
        q = start_pq_ingest_stream(stream, live, ckpt)
        if not q.awaitTermination(1800):
            q.stop()
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": "ivfpq_ingest_sweep",
                    "batches": b,
                    "vectors": n_tail,
                    "wall_s": round(wall, 2),
                    "vecs_per_s": round(n_tail / wall, 1),
                    "s_per_batch": round(wall / b, 2),
                }
            ),
            flush=True,
        )
        for d in (src, live, ckpt):
            shutil.rmtree(d, ignore_errors=True)

    # ---- BM25 family (stress_bm25's corpus) ----
    tok = lambda p: F.concat(  # noqa: E731
        F.lit("t"),
        F.pmod(F.xxhash64(F.col("id") * 131 + p), F.lit(vocab)).cast(
            "string"
        ),
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
    n_base = int(n_docs * 0.8)
    dtail = docs.filter(F.col("doc_id") >= n_base)
    n_dtail = dtail.count()
    bm_base = tempfile.mkdtemp(prefix="sweep_bm25_base_")
    build_bm25_index(
        docs.filter(F.col("doc_id") < n_base), bm_base, n_buckets=64
    )
    print(
        json.dumps({"corpus": {"docs": n_docs, "tail": n_dtail}}),
        flush=True,
    )

    for b in sweep:
        src = tempfile.mkdtemp(prefix=f"sweep_bm25_src{b}_")
        dtail.repartition(b).write.mode("overwrite").parquet(src)
        live = tempfile.mkdtemp(prefix=f"sweep_bm25_live{b}_")
        shutil.rmtree(live)
        shutil.copytree(bm_base, live)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        ckpt = tempfile.mkdtemp(prefix=f"sweep_bm25_ckpt{b}_")
        t0 = time.perf_counter()
        q = start_bm25_ingest_stream(stream, live, ckpt)
        if not q.awaitTermination(900):
            q.stop()
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": "bm25_ingest_sweep",
                    "batches": b,
                    "docs": n_dtail,
                    "wall_s": round(wall, 2),
                    "docs_per_s": round(n_dtail / wall, 1),
                    "s_per_batch": round(wall / b, 2),
                }
            ),
            flush=True,
        )
        for d in (src, live, ckpt):
            shutil.rmtree(d, ignore_errors=True)
    # every datapoint above is already flushed — this marker tells a
    # reader the run is complete even if the large-state JVM teardown
    # below takes a while (observed minutes at 1M-row scale)
    print(json.dumps({"done": True}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
