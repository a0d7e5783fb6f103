"""Targeted residual-PQ recall sweep: refine_factor × nprobe on the
stress_ann corpus, without re-running the full lifecycle harness.

Motivation (round 9): at dim=128 the full harness measured residual
refined recall@10 = 0.86 at nprobe=4/rf=100 — below the 1.00 the
same settings give at dim=32 — because per-subspace quantization
noise sums over 4× more subspaces while the shortlist stayed k×100.
This runner rebuilds ONLY the IVFPQ index on the identical corpus
(stress_ann.clustered_corpus) and maps the recall/latency surface
over the two knobs, so SCALING.md can state which knob buys the
recall back and at what cost.

Usage: python tools/stress_ann_sweep.py [n_vecs] [dim] [nlist] [m]
                                        [ksub] [rf1,rf2,...] [np1,np2,...]
Defaults 1_000_000 x 128, nlist 64, m=16, ksub=256, rf 100,300,500,
nprobe 4,8. Single-shot timings on cache-warmed inputs — scale
datapoints, not benchmarks (run idle).

Memory sizing (round-10 lesson, learned from a silent OOM): local
mode puts the eagerly-checkpointed corpus, the MLlib fit caches, AND
the driver in ONE JVM whose heap defaults to 8g
(session.py SPARK_GRAFT_DRIVER_MEM). That holds to ~1M x 128-d
(~0.5 GB of vectors) but a 1M x 1536-d corpus is ~6 GB raw before
MLlib's caching — export SPARK_GRAFT_DRIVER_MEM=64g for
full-embedding-width runs at >=10^6 vectors. On a real cluster this
is ordinary executor sizing, not a design constraint.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from big_data_spark.functions import l2_sq
from big_data_spark.operators.similarity import (
    build_ivfpq_index,
    ivfpq_search_refined,
)
from big_data_spark.session import get_spark
from stress_ann import clustered_corpus, perturbed_queries


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    nlist = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    m = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    ksub = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    rfs = [int(x) for x in (sys.argv[6] if len(sys.argv) > 6 else "100,300,500").split(",")]
    nps = [int(x) for x in (sys.argv[7] if len(sys.argv) > 7 else "4,8").split(",")]

    spark = get_spark("stress-ann-sweep")
    emb = clustered_corpus(spark, n_vecs, dim, nlist)
    n = emb.count()
    print(json.dumps({"corpus": {"vectors": n, "dim": dim, "centers": nlist}}),
          flush=True)
    queries = perturbed_queries(emb)

    l2_truth = []
    for q in queries:
        ql = F.array(*[F.lit(float(x)) for x in q])
        l2_truth.append([
            r["vec_id"]
            for r in emb.select("vec_id", l2_sq(F.col("embedding"), ql).alias("d2"))
            .orderBy("d2", "vec_id").limit(10).collect()
        ])

    t0 = time.perf_counter()
    ivfpq = build_ivfpq_index(emb, nlist=nlist, m=m, ksub=ksub)
    ivfpq.codes.localCheckpoint(eager=True).count()
    print(json.dumps({"op": "ivfpq_build", "nlist": nlist, "m": m, "ksub": ksub,
                      "wall_s": round(time.perf_counter() - t0, 2)}), flush=True)

    for np_ in nps:
        for rf in rfs:
            ts, rs = [], []
            for q, t in zip(queries, l2_truth):
                t0 = time.perf_counter()
                got = [
                    r["vec_id"]
                    for r in ivfpq_search_refined(
                        ivfpq, emb, q, k=10, nprobe=np_, refine_factor=rf
                    ).collect()
                ]
                ts.append(time.perf_counter() - t0)
                rs.append(len(set(got) & set(t)) / 10.0)
            print(json.dumps({
                "op": "ivfpq_refined_sweep", "nprobe": np_, "refine_factor": rf,
                "median_s": round(statistics.median(ts), 3),
                "mean_recall_at_10": round(sum(rs) / len(rs), 3),
            }), flush=True)
    print(json.dumps({"done": True}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
