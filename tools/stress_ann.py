"""ANN stress harness: the persisted-IVF serving path and PQ/ADC at
1M vectors (~200x the sf0.1 embeddings table).

Generates a deterministic clustered corpus (64 latent centers + small
per-vector noise — so probe pruning has real structure to exploit,
like production embeddings), then measures, one JSON line each:

  ivf_build     build_ivf_index(nlist=64): coarse KMeans fit + assign
  ivf_save      partitionBy(cell) persist — the serving layout
  ivf_search    median latency over 5 queries on the LOADED index
                (directory-pruned candidate scan, nprobe=4) + mean
                recall@10 vs exact
  brute_force   the same 5 queries, exact full-scan cosine top-10 —
                the number probe pruning is up against
  pq_build      build_pq_index(m=4, ksub=256): 4 subspace KMeans
                fits sized to the corpus (see capacity note below)
  pq_adc        median ADC search latency + mean recall@10 vs exact
                (code-table scan, no raw vectors touched; coarse —
                4x8 codes cannot separate within-cluster structure)
  pq_refined    ADC shortlist + exact re-rank broadcast semi-join —
                the production IVF-PQ refine stage
  ivfpq_build   build_ivfpq_index(nlist, m, ksub): coarse KMeans +
                m subspace fits on the RESIDUALS (round-8: the fix
                for flat-PQ's ADC recall collapse on clustered
                corpora — same-cluster vectors tie on flat codes)
  ivfpq_adc     cell-pruned residual ADC (nprobe=4): median latency
                + mean recall@10 vs exact L2
  ivfpq_refined residual ADC shortlist + exact re-rank, emitted at
                (nprobe, refine_factor) ∈ {4,8} × {rf, 5·rf} — at
                32-d rf=100 already scores 1.0; at 128-d the rf
                sweep shows the shortlist (not nprobe) is the
                binding recall knob (SCALING.md round-9 datapoint;
                tools/stress_ann_sweep.py maps the surface finer)
  ivfpq_filtered 10%-selective predicate over codes-table metadata,
                auto over-probe (counting-aggregate fallback) +
                refine — recall vs the exact FILTERED truth
  ivf_ingest    stream the last 20% of the corpus into a live index
                built on the first 80% (10 micro-batches, exactly-
                once cell/batch_id leaves) — vectors/s
  ivf_merged    search latency + recall over base + uncompacted
                stream batches (read_streaming_ivf; latest-wins
                resolved after the cell filter)
  ivf_compact   compact_streaming_ivf: fold streamed batches into a
                rewritten cell-partitioned base (atomic _IVF_BASE
                manifest flip)
  ivf_folded    search latency + recall after the fold
  ivfpq_ingest / ivfpq_merged / ivfpq_compact / ivfpq_folded
                the same lifecycle on the RESIDUAL index (frame-based
                streaming encode, deferred latest-wins reads,
                cell-partitioned compacted base) — refined recall
                must hold 1.0 at every stage

Usage: python tools/stress_ann.py [n_vecs] [dim] [nlist] [m] [ksub]
                                  [refine_factor]
Defaults 1_000_000 x 32, nlist 64, PQ m=4 ksub=256, refine_factor
100 (the pq_refined shortlist = k*refine_factor). Codebook capacity
must track corpus structure: at ksub=8 (the small-SF default) all
~15k same-cluster vectors of this corpus collapse onto one of 8^4
codes, ADC ranks become arbitrary tie-breaks and even exact re-rank
cannot recover (measured recall@10 = 0.1 at 1M); ksub=64 gives 64^4
codes and the refine stage its shortlist back — the Jegou et al.
ksub=256 sizing rule, measured. Single-shot timings on cache-
warmed inputs — scale datapoints, not benchmarks.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from big_data_spark.operators.similarity import (
    brute_force_topk,
    build_ivf_index,
    build_ivfpq_index,
    build_pq_index,
    ivf_search,
    ivfpq_adc_search,
    ivfpq_search_refined,
    load_ivf_index,
    pq_adc_search,
    pq_search_refined,
    save_ivf_index,
)
from big_data_spark.functions import l2_sq
from big_data_spark.session import get_spark


def clustered_corpus(spark, n_vecs: int, dim: int, nlist: int):
    """Deterministic clustered corpus: vector = center(id % nlist) +
    noise/8, every component a hash in [-1, 1). Shared with the
    targeted sweep runner (stress_ann_sweep.py) so follow-up
    measurements run on the IDENTICAL corpus."""

    def comp(seed_col, i, scale):
        return (
            F.pmod(F.xxhash64(seed_col * 1_000_003 + i), F.lit(2000)).cast(
                "double"
            )
            / 1000.0
            - 1.0
        ) * scale

    center = F.col("id") % nlist
    return (
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


def perturbed_queries(emb, n: int = 5):
    """n query vectors: corpus vectors, lightly perturbed driver-side."""
    qrows = emb.orderBy("vec_id").limit(n).collect()
    return [
        [float(x) + (0.01 if j % 2 else -0.01) for j, x in enumerate(r["embedding"])]
        for r in qrows
    ]


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    nlist = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    m = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    ksub = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    rf = int(sys.argv[6]) if len(sys.argv) > 6 else 100

    spark = get_spark("stress-ann")

    emb = clustered_corpus(spark, n_vecs, dim, nlist)
    n = emb.count()
    print(json.dumps({"corpus": {"vectors": n, "dim": dim, "centers": nlist}}),
          flush=True)

    queries = perturbed_queries(emb)

    t0 = time.perf_counter()
    index = build_ivf_index(emb, nlist=nlist)
    index.assigned.localCheckpoint(eager=True).count()
    print(json.dumps({"op": "ivf_build", "nlist": nlist,
                      "wall_s": round(time.perf_counter() - t0, 2)}), flush=True)

    import tempfile

    path = tempfile.mkdtemp(prefix="stress_ivf_")
    t0 = time.perf_counter()
    save_ivf_index(index, path)
    print(json.dumps({"op": "ivf_save", "wall_s": round(time.perf_counter() - t0, 2)}),
          flush=True)
    served = load_ivf_index(spark, path)

    # two ground truths, one per metric: IVF ranks by COSINE
    # (brute_force_topk), the PQ paths by L2 — on a corpus with
    # varying norms the two top-10 sets legitimately differ, so each
    # path is scored against ITS metric's exact answer.
    truth = []
    bf_times = []
    for q in queries:
        t0 = time.perf_counter()
        truth.append([r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()])
        bf_times.append(time.perf_counter() - t0)
    print(json.dumps({"op": "brute_force", "metric": "cosine",
                      "median_s": round(statistics.median(bf_times), 3)}),
          flush=True)

    l2_truth = []
    for q in queries:
        ql = F.array(*[F.lit(float(x)) for x in q])
        l2_truth.append([
            r["vec_id"]
            for r in emb.select("vec_id", l2_sq(F.col("embedding"), ql).alias("d2"))
            .orderBy("d2", "vec_id").limit(10).collect()
        ])

    ivf_times, recalls = [], []
    for q, t in zip(queries, truth):
        t0 = time.perf_counter()
        got = [r["vec_id"] for r in ivf_search(served, q, k=10, nprobe=4).collect()]
        ivf_times.append(time.perf_counter() - t0)
        recalls.append(len(set(got) & set(t)) / 10.0)
    print(json.dumps({"op": "ivf_search", "nprobe": 4,
                      "median_s": round(statistics.median(ivf_times), 3),
                      "mean_recall_at_10": round(sum(recalls) / len(recalls), 3)}),
          flush=True)

    t0 = time.perf_counter()
    pq = build_pq_index(emb, m=m, ksub=ksub)
    pq.codes.localCheckpoint(eager=True).count()
    print(json.dumps({"op": "pq_build", "m": m, "ksub": ksub,
                      "wall_s": round(time.perf_counter() - t0, 2)}), flush=True)

    pq_times, pq_recalls = [], []
    for q, t in zip(queries, l2_truth):
        t0 = time.perf_counter()
        got = [r["vec_id"] for r in pq_adc_search(pq, q, k=10).collect()]
        pq_times.append(time.perf_counter() - t0)
        pq_recalls.append(len(set(got) & set(t)) / 10.0)
    print(json.dumps({"op": "pq_adc", "median_s": round(statistics.median(pq_times), 3),
                      "mean_recall_at_10": round(sum(pq_recalls) / len(pq_recalls), 3)}),
          flush=True)

    # production path: ADC shortlist + exact re-rank of k*refine rows
    rf_times, rf_recalls = [], []
    for q, t in zip(queries, l2_truth):
        t0 = time.perf_counter()
        got = [
            r["vec_id"]
            for r in pq_search_refined(pq, emb, q, k=10, refine_factor=rf).collect()
        ]
        rf_times.append(time.perf_counter() - t0)
        rf_recalls.append(len(set(got) & set(t)) / 10.0)
    print(json.dumps({"op": "pq_refined", "refine_factor": rf,
                      "median_s": round(statistics.median(rf_times), 3),
                      "mean_recall_at_10": round(sum(rf_recalls) / len(rf_recalls), 3)}),
          flush=True)

    # ---- residual (IVFADC) quantization: same m/ksub/rf budget ----
    t0 = time.perf_counter()
    ivfpq = build_ivfpq_index(emb, nlist=nlist, m=m, ksub=ksub)
    ivfpq.codes.localCheckpoint(eager=True).count()
    print(json.dumps({"op": "ivfpq_build", "nlist": nlist, "m": m, "ksub": ksub,
                      "wall_s": round(time.perf_counter() - t0, 2)}), flush=True)

    rq_times, rq_recalls = [], []
    for q, t in zip(queries, l2_truth):
        t0 = time.perf_counter()
        got = [
            r["vec_id"]
            for r in ivfpq_adc_search(ivfpq, q, k=10, nprobe=4).collect()
        ]
        rq_times.append(time.perf_counter() - t0)
        rq_recalls.append(len(set(got) & set(t)) / 10.0)
    print(json.dumps({"op": "ivfpq_adc", "nprobe": 4,
                      "median_s": round(statistics.median(rq_times), 3),
                      "mean_recall_at_10": round(sum(rq_recalls) / len(rq_recalls), 3)}),
          flush=True)

    # rf/nprobe sweep: at high dim the per-subspace quantization
    # noise sums over more subspaces, so the rf=100 shortlist can
    # leak true neighbors (measured 0.86 at 128-d vs 1.00 at 32-d) —
    # the sweep shows which knob (shortlist vs probed cells) buys the
    # recall back and at what latency
    for np_, rf_ in [(4, rf), (4, rf * 5), (8, rf), (8, rf * 5)]:
        rr_times, rr_recalls = [], []
        for q, t in zip(queries, l2_truth):
            t0 = time.perf_counter()
            got = [
                r["vec_id"]
                for r in ivfpq_search_refined(
                    ivfpq, emb, q, k=10, nprobe=np_, refine_factor=rf_
                ).collect()
            ]
            rr_times.append(time.perf_counter() - t0)
            rr_recalls.append(len(set(got) & set(t)) / 10.0)
        print(json.dumps({"op": "ivfpq_refined", "nprobe": np_,
                          "refine_factor": rf_,
                          "median_s": round(statistics.median(rr_times), 3),
                          "mean_recall_at_10": round(sum(rr_recalls) / len(rr_recalls), 3)}),
              flush=True)

    # ---- filtered residual search (the q152 discipline on the
    # compressed layout): 10% label selectivity, auto over-probe from
    # the counting-aggregate fallback (no recorded stats — the
    # estimate itself is part of the measured cost) ----
    import dataclasses

    ivfpq_l = dataclasses.replace(
        ivfpq,
        codes=ivfpq.codes.withColumn(
            "label", (F.col("vec_id") % 10).cast("int")
        ),
    )
    fl_truth = []
    for q in queries:
        ql = F.array(*[F.lit(float(x)) for x in q])
        fl_truth.append([
            r["vec_id"]
            for r in emb.filter(F.col("vec_id") % 10 == 3)
            .select("vec_id", l2_sq(F.col("embedding"), ql).alias("d2"))
            .orderBy("d2", "vec_id").limit(10).collect()
        ])
    fl_times, fl_recalls = [], []
    eff = None
    for q, t in zip(queries, fl_truth):
        t0 = time.perf_counter()
        res = ivfpq_search_refined(
            ivfpq_l, emb, q, k=10, nprobe=4, refine_factor=rf,
            where="label = 3", auto_nprobe=True,
        )
        got = [r["vec_id"] for r in res.collect()]
        fl_times.append(time.perf_counter() - t0)
        fl_recalls.append(len(set(got) & set(t)) / 10.0)
        eff = res.effective_nprobe
    print(json.dumps({"op": "ivfpq_filtered", "base_nprobe": 4,
                      "effective_nprobe": eff, "selectivity": 0.1,
                      "median_s": round(statistics.median(fl_times), 3),
                      "mean_recall_at_10": round(sum(fl_recalls) / len(fl_recalls), 3)}),
          flush=True)

    # ---- streaming ingest lifecycle (dense sibling of the BM25
    # lifecycle in tools/stress_bm25.py): base on 80%, stream 20% ----
    from big_data_spark.streaming.sinks import (
        compact_streaming_ivf,
        read_streaming_ivf,
        start_vector_ingest_stream,
    )

    n_base = int(n_vecs * 0.8)
    base_emb = emb.filter(F.col("vec_id") < n_base)
    tail_emb = emb.filter(F.col("vec_id") >= n_base)
    live_path = tempfile.mkdtemp(prefix="stress_ivf_live_")
    save_ivf_index(build_ivf_index(base_emb, nlist=nlist), live_path)

    src = tempfile.mkdtemp(prefix="stress_ivf_src_")
    tail_emb.repartition(10).write.mode("overwrite").parquet(src)
    n_tail = tail_emb.count()
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ckpt = tempfile.mkdtemp(prefix="stress_ivf_ckpt_")
    t0 = time.perf_counter()
    q_ing = start_vector_ingest_stream(stream, live_path, ckpt)
    q_ing.awaitTermination(600)
    ing_s = time.perf_counter() - t0
    print(json.dumps({"op": "ivf_ingest", "vectors": n_tail, "batches": 10,
                      "wall_s": round(ing_s, 2),
                      "vecs_per_s": round(n_tail / ing_s, 1)}), flush=True)

    def _searches(idx):
        ts, rs = [], []
        for q, t in zip(queries, truth):
            t0 = time.perf_counter()
            got = [r["vec_id"] for r in ivf_search(idx, q, k=10, nprobe=4).collect()]
            ts.append(time.perf_counter() - t0)
            rs.append(len(set(got) & set(t)) / 10.0)
        return round(statistics.median(ts), 3), round(sum(rs) / len(rs), 3)

    med, rec = _searches(read_streaming_ivf(spark, live_path))
    print(json.dumps({"op": "ivf_merged", "median_s": med,
                      "mean_recall_at_10": rec}), flush=True)

    t0 = time.perf_counter()
    folded = compact_streaming_ivf(spark, live_path)
    print(json.dumps({"op": "ivf_compact", "batches_folded": folded,
                      "wall_s": round(time.perf_counter() - t0, 2)}), flush=True)

    med, rec = _searches(read_streaming_ivf(spark, live_path))
    print(json.dumps({"op": "ivf_folded", "median_s": med,
                      "mean_recall_at_10": rec}), flush=True)

    # ---- residual-index streaming lifecycle: the SAME tail streamed
    # into a live IVFPQ index built on the first 80% (frame-based
    # encode — the hot path the sink runs) ----
    from big_data_spark.operators.similarity import save_ivfpq_index
    from big_data_spark.streaming.sinks import (
        compact_streaming_pq,
        read_streaming_pq,
        start_pq_ingest_stream,
    )

    pq_live = tempfile.mkdtemp(prefix="stress_ivfpq_live_")
    save_ivfpq_index(
        build_ivfpq_index(base_emb, nlist=nlist, m=m, ksub=ksub), pq_live
    )
    ckpt2 = tempfile.mkdtemp(prefix="stress_ivfpq_ckpt_")
    stream2 = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.perf_counter()
    q_ing2 = start_pq_ingest_stream(stream2, pq_live, ckpt2)
    if not q_ing2.awaitTermination(900):
        q_ing2.stop()
    ing2_s = time.perf_counter() - t0
    print(json.dumps({"op": "ivfpq_ingest", "vectors": n_tail, "batches": 10,
                      "wall_s": round(ing2_s, 2),
                      "vecs_per_s": round(n_tail / ing2_s, 1)}), flush=True)

    def _rq_searches(idx):
        ts, rs = [], []
        for q, t in zip(queries, l2_truth):
            t0 = time.perf_counter()
            got = [
                r["vec_id"]
                for r in ivfpq_search_refined(
                    idx, emb, q, k=10, nprobe=4, refine_factor=rf
                ).collect()
            ]
            ts.append(time.perf_counter() - t0)
            rs.append(len(set(got) & set(t)) / 10.0)
        return round(statistics.median(ts), 3), round(sum(rs) / len(rs), 3)

    med, rec = _rq_searches(read_streaming_pq(spark, pq_live))
    print(json.dumps({"op": "ivfpq_merged", "median_s": med,
                      "mean_recall_at_10": rec}), flush=True)

    t0 = time.perf_counter()
    folded = compact_streaming_pq(spark, pq_live)
    print(json.dumps({"op": "ivfpq_compact", "batches_folded": folded,
                      "wall_s": round(time.perf_counter() - t0, 2)}), flush=True)

    med, rec = _rq_searches(read_streaming_pq(spark, pq_live))
    print(json.dumps({"op": "ivfpq_folded", "median_s": med,
                      "mean_recall_at_10": rec}), flush=True)
    # every datapoint above is already flushed — this marker tells a
    # reader the run is complete even if the large-state JVM teardown
    # below takes a while (observed minutes at 1M-row scale)
    print(json.dumps({"done": True}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
