"""BM25 fold-cost scaling harness (VERDICT r07 order #6): is
compact_bm25_index's cost linear in the BASE size or in the DELTA?
The r07 lifecycle measured one point (fold of 9 streamed batches over
a 400k-doc base = 43 s) — not enough to set the LSM cadence. This
harness holds the streamed delta FIXED (50k docs in 10 micro-batches)
and sweeps the base size; if fold cost tracks the base (a full
rewrite of postings + doclen bases), compaction should run rarely and
amortize over many deltas; if it tracks the delta, fold-per-N-batches
is cheap at any base size.

Per base size B: build the index on B docs, stream the SAME 50k tail
(ids disjoint from every base), compact, and report — one JSON line
per stage with the base size attached.

Usage: python tools/stress_bm25_fold.py [base_sizes...]
Defaults 500_000 1_000_000 2_000_000. Corpus/generator identical to
tools/stress_bm25.py. Single-shot timings on cache-warmed inputs —
scale datapoints, not benchmarks.
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
from big_data_spark.session import get_spark
from big_data_spark.streaming.sinks import (
    compact_bm25_index,
    start_bm25_ingest_stream,
)

N_TOKENS = 60
VOCAB = 50_000
DELTA = 50_000
DELTA_BATCHES = 10


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [500_000, 1_000_000, 2_000_000]

    spark = get_spark("stress-bm25-fold")

    tok = lambda p: F.concat(  # noqa: E731
        F.lit("t"),
        F.pmod(F.xxhash64(F.col("id") * 131 + p), F.lit(VOCAB)).cast(
            "string"
        ),
    )

    def corpus(lo: int, hi: int):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(F.sequence(F.lit(0), F.lit(N_TOKENS - 1)), tok),
            ).alias("text"),
        )

    # one fixed delta, ids above every base size
    top = max(sizes)
    tail = corpus(top, top + DELTA).localCheckpoint(eager=True)
    src = tempfile.mkdtemp(prefix="fold_src_")
    tail.repartition(DELTA_BATCHES).write.mode("overwrite").parquet(src)
    n_tail = tail.count()

    for base_n in sizes:
        path = tempfile.mkdtemp(prefix=f"fold_base{base_n}_")
        base = corpus(0, base_n).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        build_bm25_index(base, path, n_buckets=64)
        print(
            json.dumps(
                {
                    "op": "fold_base_build",
                    "base_docs": base_n,
                    "wall_s": round(time.perf_counter() - t0, 2),
                }
            ),
            flush=True,
        )
        base.unpersist()

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        ckpt = tempfile.mkdtemp(prefix=f"fold_ckpt{base_n}_")
        t0 = time.perf_counter()
        q = start_bm25_ingest_stream(stream, path, ckpt)
        if not q.awaitTermination(900):
            q.stop()
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": "fold_delta_ingest",
                    "base_docs": base_n,
                    "delta_docs": n_tail,
                    "batches": DELTA_BATCHES,
                    "wall_s": round(wall, 2),
                }
            ),
            flush=True,
        )

        t0 = time.perf_counter()
        folded = compact_bm25_index(spark, path)
        print(
            json.dumps(
                {
                    "op": "fold_compact",
                    "base_docs": base_n,
                    "batches_folded": folded,
                    "wall_s": round(time.perf_counter() - t0, 2),
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    # every datapoint above is already flushed — this marker tells a
    # reader the run is complete even if the large-state JVM teardown
    # below takes a while (observed minutes at 1M-row scale)
    print(json.dumps({"done": True}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
