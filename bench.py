"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...},
   "sentinels": {...}, "sentinel_reps": {...}, "sf": ...}

The headline metric is total wall-clock over the bench set; per-query
seconds are reported individually. B1 (ETL-chain throughput) also
reports rows/s in the queries map as etl_rows_per_s.

SENTINELS (round 7, VERDICT r06 order #3): the full-session bench runs
115 queries in ONE SparkSession, so cross-round deltas conflate plan
cost with accumulated session state (checkpoint blocks, GC pressure) —
r06's uniform ~1.45x drift on UNCHANGED code proved the session, not
the engine, was being measured. Each sentinel therefore runs in a
FRESH subprocess (own JVM, nothing else ever ran in it): 3 reps, the
MEDIAN is the number. Sentinels are the stable cross-round comparison
basis; the full-session numbers remain for totals and relative
ordering. Skip with SPARK_GRAFT_SENTINELS=0 (children inherit the
skip implicitly — they are invoked with --sentinel-child).

CONTAMINATION RETRY (round 12, VERDICT r11 order #4): a child whose
pre-run 1-min load exceeds 25% of the cores gets ONE bounded
cooldown-and-rerun; both attempts are recorded in the JSON
(``sentinel_retries``) and the lower-load attempt supplies the
median, so a loaded driver box self-corrects instead of requiring a
judge re-run. Caps: 3 retries/phase, 60 s cooldown, all inside the
phase budget (raised 420 -> 600 s to absorb them).

The full-session loop also releases dead plan state between entries
(gc.collect() drops the py4j proxies pinning finished DataFrames'
JVM objects; a periodic System.gc() lets ContextCleaner reclaim their
localCheckpoint blocks — Spark's own periodic-GC cleaner defaults to
30 min, far longer than a bench run). Disable with
SPARK_GRAFT_BENCH_GC=0 to reproduce the accumulation mode.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from big_data_spark.fixtures import synthetic_postings
from big_data_spark.operators.job_etl import clean_job_postings
from big_data_spark.queries import QUERIES
from big_data_spark.session import get_spark

# BASELINE.md bench targets: B1 ETL chain, B2 explode->agg->score,
# plus the join/topk/dedup/similarity headliners.
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q05_nation_revenue",
    "q08_top3_orders_per_customer",
    "q19_event_windows",
    "q40_token_hot_score",
    "q43_fingerprint_dedup",
    "q47_lsh_dedup_groups",
    "q66_lsh_dedup_components",
    "q67_corpus_prep",
    "q68_media_features",
    "q60_cosine_topk",
    "q64_ivf_ann",
    "q55_purchase_attribution_asof",
    "q56_incident_click_range_join",
    "q77_corpus_mixing",
    "q79_repetition_quality",
    "q80_decontamination",
    "q89_volume_shipping",
    "q96_tfidf_cosine_pairs",
    "q94_length_curriculum",
    "q97_shuffle_shards",
    # round-4 additions: the remaining LLM-pipeline entries that had
    # oracle coverage but no bench row (q92 is output-bound by design
    # at small SF — ~30% of the synthetic docs are true near-dups, see
    # SCALING.md — its number tracks pair-output volume, not plan cost)
    "q92_simhash_hamming_pairs",
    "q93_stratified_split",
    "q95_group_topk_sample",
    "q100_batch_ann_topk",
    "q101_corpus_health",
    # round-4 additions: remaining TPC-H shapes + two corpus operators
    "q102_market_share",
    "q103_top_supplier",
    "q104_part_supplier_variety",
    "q105_excess_shippers",
    "q106_segment_dedup",
    "q107_overlap_chunks",
    "q108_source_shingle_overlap",
    "q109_gap_fill",
    "q110_unigram_quality",
    "q111_important_stock",
    "q112_knn_join",
    "q113_token_budget_mix",
    "q114_quality_percentile_cut",
    "q115_intradoc_dedup",
    "q116_part_attr_unpivot",
    "q117_grouping_sets",
    "q118_time_weighted_avg",
    "q119_exact_percentiles",
    "q120_containment_pairs",
    "q121_bpe_pair_counts",
    "q122_distribution_drift",
    "q123_native_session_windows",
    "q124_topk_with_ties",
    "q125_native_mad",
    "q126_rolling_time_window",
    "q127_fuzzy_name_pairs",
    "q128_copurchase_pairs",
    "q129_quality_classifier",
    "q130_constraint_report",
    "q131_bigram_quality",
    "q132_temperature_mix",
    "q133_sliding_active_users",
    "q134_key_skew_audit",
    "q135_peak_concurrency",
    "q136_snapshot_diff",
    "q137_bm25_topk",
    "q138_hybrid_rrf",
    "q139_ab_welch_t",
    "q140_event_transitions",
    "q141_triangle_count",
    "q142_rfm_segments",
    "q143_hourly_anomalies",
    "q144_seasonal_backtest",
    "q145_decayed_trending",
    # round-5 additions
    "q146_pagerank",
    "q147_weighted_sample",
    "q148_windowed_funnel",
    "q149_retrieval_metrics",
    "q150_cuped_adjustment",
    "q151_srm_check",
    "q152_filtered_ann",
    "q153_join_explosion_audit",
    # round-6 additions
    "q154_khop_reachability",
    "q155_weighted_quantiles",
    "q156_largest_remainder_alloc",
    "q157_cdc_log_compaction",
    "q158_golden_record",
    "q159_quota_sample",
    "q160_last_touch_attribution",
    # round-6 late additions: the statistics/audit family
    "q161_revenue_lorenz",
    "q162_chisq_independence",
    "q163_cusum_changepoint",
    "q164_calibration_bins",
    "q165_int8_quantization",
    "q166_ks_two_sample",
    "q167_zipf_slope",
    # round-6 batch 4: interval algebra / integrity / itemset mining
    "q168_interval_union",
    "q169_fk_orphan_audit",
    "q170_duplication_fraction",
    "q171_token_pmi",
    "q172_association_rules",
    "q173_benford_audit",
    # round-6 batch 5: tokenizer coverage / bigram LM / model eval
    "q174_oov_rate",
    "q175_bigram_logprob",
    "q176_langid_confusion",
    "q177_token_entropy",
    "q178_centroid_shift",
    "q179_source_kl",
    "q180_approx_groupby_ci",
    "q181_burn_rate_alerts",
    "q182_lsh_eval",
    "q183_dedup_impact",
    # round-8 additions: deterministic residual-PQ twins + the
    # m01/m04 hard-signal companions
    "q184_residual_adc_topk",
    "q185_ivfpq_pruned_refine",
    "q186_kmeans_fit_invariants",
    "q187_w2v_vocab_invariants",
    # round-9 additions: distributed BPE + unigram-LM tokenizer
    # training
    "q188_bpe_merge_sequence",
    "q189_bpe_encoded_vocab",
    "q190_unigram_seed_vocab",
    "q191_unigram_roundtrip",
    "q192_corpus_encode_roundtrip",
    "q193_tokenizer_compression",
    # round-10 additions: longest-match (trie) encoder + byte-level
    # OOV fallback through the corpus encode path + pre-tokenization
    "q194_longest_match_encode",
    "q195_byte_fallback_encode",
    "q196_pretokenized_vocab",
    # round-11 additions: tokenizer capstone chain + token-budget
    # mixing on real tokenizer piece counts
    "q197_tokenizer_capstone",
    "q198_token_budget_real_counts",
    "q199_packed_sequences",
    # round-12 additions: int32 token-id bundle encode, packed id
    # shards round-tripped through the persisted files, and the
    # packing-policy surface
    "q200_token_id_encode",
    "q201_packed_id_shards",
    "q202_packing_policies",
]

ETL_ROWS = int(os.environ.get("SPARK_GRAFT_ETL_ROWS", "850000"))

# Fixed cross-round sentinel set (VERDICT r06 order #3/#4): B1-B5 plus
# a spread of query shapes — flagship agg (q01), iterative fixpoint
# (q66), banded pair join (q92), exact percentiles (q119), the r06
# drift sentinel (q134), and the one driver-bench outlier that needed
# an uncontended number (q137).
# NOISE FLOOR (round 8, VERDICT r07 #5): ±25% round-over-round
# movement in a sentinel median is box noise — the r07 judge re-run
# of identical code on an idle box landed within ±15% of the recorded
# medians, and 3-rep medians still carry one warm rep's variance. A
# regression claim needs a sentinel moving >= 25% while its neighbors
# hold; see SCALING.md "Noise floor".
SENTINELS = [
    "etl_chain",
    "skill_hot_agg",
    "kmeans_fit_85k",
    "rf_train_eval_85k",
    "stream_etl_24k",
    "q01_pricing_summary",
    "q66_lsh_dedup_components",
    "q92_simhash_hamming_pairs",
    "q119_exact_percentiles",
    "q134_key_skew_audit",
    "q137_bm25_topk",
]
SENTINEL_REPS = int(os.environ.get("SPARK_GRAFT_SENTINEL_REPS", "3"))


def _stream_inputs(sdir: str) -> str:
    """Write the B5 streaming source files (24k rows); returns src dir."""
    import json as _json

    from big_data_spark.fixtures import JOBS_COLUMNS, JOBS_CORPUS

    src = os.path.join(sdir, "src")
    os.makedirs(src, exist_ok=True)
    for part in range(4):
        with open(os.path.join(src, f"p{part}.json"), "w") as f:
            for _rep in range(500):
                for i, row in enumerate(JOBS_CORPUS):
                    if i % 4 != part:
                        continue
                    rec = dict(zip(JOBS_COLUMNS, row))
                    rec["event_time"] = "2024-01-01 10:00:00"
                    f.write(_json.dumps(rec) + "\n")
    return src


def _sentinel_reps(spark, name: str, sf_dir: str) -> list[float]:
    """Run one sentinel SENTINEL_REPS times in the CURRENT (fresh)
    session; returns per-rep seconds. Setup (input materialization)
    is untimed, mirroring the full-session bench."""
    import shutil
    import tempfile

    times: list[float] = []
    if name in ("etl_chain", "skill_hot_agg"):
        raw_dir = tempfile.mkdtemp(prefix="sent_raw_")
        synthetic_postings(spark, ETL_ROWS).write.mode("overwrite").parquet(
            raw_dir
        )
        raw = spark.read.parquet(raw_dir)
        from big_data_spark.operators.skills import skill_hot_scores

        for _ in range(SENTINEL_REPS):
            t0 = time.perf_counter()
            if name == "etl_chain":
                clean_job_postings(raw, deterministic_id=True).count()
            else:
                skill_hot_scores(clean_job_postings(raw), min_jobs=10).count()
            times.append(time.perf_counter() - t0)
        shutil.rmtree(raw_dir, ignore_errors=True)
    elif name in ("kmeans_fit_85k", "rf_train_eval_85k"):
        from big_data_spark.ml.features import job_features
        from big_data_spark.ml.pipelines import (
            fit_job_clustering,
            fit_salary_rf,
        )

        featured = job_features(
            clean_job_postings(synthetic_postings(spark, 85_000))
        ).cache()
        featured.count()
        for _ in range(SENTINEL_REPS):
            t0 = time.perf_counter()
            if name == "kmeans_fit_85k":
                fit_job_clustering(featured, k=5)
            else:
                fit_salary_rf(featured)
            times.append(time.perf_counter() - t0)
        featured.unpersist()
    elif name == "stream_etl_24k":
        from big_data_spark.streaming import stream_clean_postings

        sdir = tempfile.mkdtemp(prefix="sent_stream_")
        src = _stream_inputs(sdir)
        for rep in range(SENTINEL_REPS):
            t0 = time.perf_counter()
            q = stream_clean_postings(
                spark,
                src,
                os.path.join(sdir, f"sink{rep}"),
                os.path.join(sdir, f"ckpt{rep}"),
            )
            # a hung availableNow stream must not keep running into
            # the next rep (contending CPUs) or into the rmtree of
            # its own source/checkpoint dirs (ADVICE r07)
            if not q.awaitTermination(300):
                q.stop()
            times.append(time.perf_counter() - t0)
        shutil.rmtree(sdir, ignore_errors=True)
    else:
        fn = QUERIES[name].fn
        for _ in range(SENTINEL_REPS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times.append(time.perf_counter() - t0)
    return [round(t, 3) for t in times]


def _sentinel_child(name: str) -> None:
    """Child-process entry: fresh JVM, one sentinel, reps on stdout."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(f"bench-sentinel-{name}")
    reps = _sentinel_reps(spark, name, sf_dir)
    print("SENTINEL_JSON:" + json.dumps({"name": name, "reps": reps}), flush=True)
    spark.stop()


def _spawn_sentinel_child(name: str) -> list[float]:
    """Run one sentinel child subprocess; returns its rep seconds."""
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--sentinel-child", name],
        capture_output=True,
        text=True,
        timeout=900,
        check=True,
    ).stdout
    payload = next(
        line for line in out.splitlines()
        if line.startswith("SENTINEL_JSON:")
    )
    return json.loads(payload[len("SENTINEL_JSON:"):])["reps"]


def _run_sentinels() -> tuple[dict, dict, dict, dict]:
    """Run every sentinel in its own subprocess, SERIALLY (parallel
    children would contend for the 32 cores and corrupt exactly the
    timings this exists to stabilize). A phase budget (default 600 s,
    ~2x the measured phase cost) bounds the worst case: on a degraded
    box the remaining sentinels are skipped (null) rather than
    risking the whole bench line against a harness timeout.

    CONTAMINATION RETRY (VERDICT r11 order #4 — three consecutive
    loaded driver windows made cross-round deltas unusable without a
    judge re-run): when a child's pre-run load sample exceeds the
    foreign-load threshold, the child still runs (its numbers are
    recorded either way), then the phase sleeps one bounded cooldown
    and re-runs THAT child once; both attempts land in the JSON
    (``sentinel_retries``) and the attempt with the LOWER pre-run
    load supplies the median — so the committed line carries its own
    clean-or-flagged numbers instead of needing adjudication. Retries
    are budget-bounded (total-phase budget + a per-phase retry cap);
    no new knobs beyond the cap/cooldown env overrides. Returns
    (medians, reps, load1_before, retries)."""
    budget = float(os.environ.get("SPARK_GRAFT_SENTINEL_BUDGET", "600"))
    cooldown = float(os.environ.get("SPARK_GRAFT_SENTINEL_COOLDOWN", "60"))
    max_retries = int(os.environ.get("SPARK_GRAFT_SENTINEL_RETRIES", "3"))
    load_frac = 0.25  # same foreign-load threshold as the r08 warning
    phase_t0 = time.perf_counter()
    medians: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    retries: dict[str, dict] = {}
    retries_used = 0
    # Contention forensics (VERDICT r08 order #5): the r08 line carried
    # 6x-inflated kmeans/rf cells that only a judge re-run could
    # invalidate. Record the 1-minute load average BEFORE each child so
    # the committed JSON itself shows whether something shared the box:
    # the first sample is taken before ANY child has run, so load there
    # is foreign by construction; later samples mix in the previous
    # child's decaying 1-min average — the decay SERIES is the signal
    # (a clean phase decays toward 0 between children, a contended one
    # stays pinned near/above the core count).
    ncpu = os.cpu_count() or 32
    load_before: dict[str, float] = {}
    for name in SENTINELS:
        load1 = round(os.getloadavg()[0], 2)
        load_before[name] = load1
        if not medians and load1 / ncpu > load_frac:
            # nothing of ours has run yet — this load is foreign
            print(
                f"SENTINEL CONTAMINATION WARNING: load1={load1} on "
                f"{ncpu} cores before the first sentinel; timings in "
                f"this phase are suspect",
                file=sys.stderr,
            )
        if time.perf_counter() - phase_t0 > budget:
            print(
                f"sentinel budget ({budget}s) exhausted; skipping {name}",
                file=sys.stderr,
            )
            medians[name] = None
            all_reps[name] = []
            continue
        try:
            reps = _spawn_sentinel_child(name)
            all_reps[name] = reps
            medians[name] = round(statistics.median(reps), 3)
        except Exception as exc:  # a broken sentinel must not kill the line
            print(f"sentinel {name} failed: {exc}", file=sys.stderr)
            medians[name] = None
            all_reps[name] = []
            continue
        if (
            load1 / ncpu > load_frac
            and retries_used < max_retries
            # a retry costs ~cooldown + the child we just timed; only
            # start one the budget can absorb
            and time.perf_counter() - phase_t0
            + cooldown + 3 * medians[name] * SENTINEL_REPS < budget
        ):
            retries_used += 1
            time.sleep(cooldown)
            load2 = round(os.getloadavg()[0], 2)
            try:
                reps2 = _spawn_sentinel_child(name)
            except Exception as exc:
                print(f"sentinel retry {name} failed: {exc}", file=sys.stderr)
                continue
            chosen = "retry" if load2 <= load1 else "first"
            retries[name] = {
                "first_load1": load1,
                "first_reps": all_reps[name],
                "retry_load1": load2,
                "retry_reps": reps2,
                "chosen": chosen,
            }
            if chosen == "retry":
                all_reps[name] = reps2
                medians[name] = round(statistics.median(reps2), 3)
                load_before[name] = load2
    return medians, all_reps, load_before, retries


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # Fresh-session sentinels run FIRST, before the main session
    # exists, so children never contend with it for cores.
    sentinels: dict = {}
    sentinel_reps: dict = {}
    sentinel_load: dict = {}
    sentinel_retries: dict = {}
    if os.environ.get("SPARK_GRAFT_SENTINELS", "1") != "0":
        sentinels, sentinel_reps, sentinel_load, sentinel_retries = (
            _run_sentinels()
        )

    bench_gc = os.environ.get("SPARK_GRAFT_BENCH_GC", "1") != "0"
    spark = get_spark("big_data_spark-bench")

    results: dict[str, float] = {}

    # Materialize the synthetic raw postings once (not timed) so B1/B2
    # measure the operators, not the generator.
    import shutil
    import tempfile

    raw_dir = tempfile.mkdtemp(prefix="bench_raw_")
    synthetic_postings(spark, ETL_ROWS).write.mode("overwrite").parquet(raw_dir)
    raw = spark.read.parquet(raw_dir)

    # B1: batch ETL chain throughput (reference anchor job_streaming.py:62-156;
    # 10x the reference's 85k-row corpus).
    t0 = time.perf_counter()
    n_out = clean_job_postings(raw, deterministic_id=True).count()
    etl_sec = time.perf_counter() - t0
    results["etl_chain"] = round(etl_sec, 3)
    results["etl_rows_per_s"] = round(n_out / etl_sec, 1)

    # B2: ETL -> explode skills -> per-skill agg -> hot score at the
    # same row count (reference anchor train_gbt.py:59-116).
    from big_data_spark.operators.skills import skill_hot_scores

    t0 = time.perf_counter()
    skill_hot_scores(clean_job_postings(raw), min_jobs=10).count()
    b2_sec = time.perf_counter() - t0
    results["skill_hot_agg"] = round(b2_sec, 3)
    shutil.rmtree(raw_dir, ignore_errors=True)

    # B3/B4 at the reference's own data scale (~85k postings,
    # BASELINE.md): feature prep + KMeans k=5 fit; RF 100x10 fit +
    # rmse/mae/r2 evaluation.
    from big_data_spark.ml.features import job_features
    from big_data_spark.ml.pipelines import fit_job_clustering, fit_salary_rf

    ref_scale = synthetic_postings(spark, 85_000)
    featured = job_features(clean_job_postings(ref_scale)).cache()
    featured.count()  # materialize outside timing
    t0 = time.perf_counter()
    fit_job_clustering(featured, k=5)
    results["kmeans_fit_85k"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    fit_salary_rf(featured)
    results["rf_train_eval_85k"] = round(time.perf_counter() - t0, 3)
    featured.unpersist()
    ml_sec = results["kmeans_fit_85k"] + results["rf_train_eval_85k"]

    # B5: streaming micro-batch ETL latency (file source, availableNow)
    from big_data_spark.streaming import stream_clean_postings

    sdir = tempfile.mkdtemp(prefix="bench_stream_")
    src = _stream_inputs(sdir)
    t0 = time.perf_counter()
    q = stream_clean_postings(
        spark, src, os.path.join(sdir, "sink"), os.path.join(sdir, "ckpt")
    )
    # same rule as the sentinel path (ADVICE r07): a hung availableNow
    # stream must not keep contending with every query benched after it
    # (or with the rmtree of its own source/checkpoint dirs)
    if not q.awaitTermination(300):
        q.stop()
    results["stream_etl_24k"] = round(time.perf_counter() - t0, 3)
    shutil.rmtree(sdir, ignore_errors=True)

    for i, name in enumerate(BENCH_QUERIES):
        fn = QUERIES[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        results[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0
        # q66 is iterative: report rounds-to-convergence so its wall
        # time (~1 scheduler round-trip per round at small SF) isn't
        # misread as a per-row plan cost.
        rounds = getattr(getattr(fn, "__wrapped__", fn), "last_rounds", None)
        if rounds is not None:
            results[f"{name.split('_')[0]}_rounds"] = rounds
        if bench_gc:
            # Release the finished query's plan state OUTSIDE the next
            # entry's timing: gc.collect() detaches the py4j proxies
            # pinning its JVM DataFrames/RDDs; the periodic System.gc()
            # lets ContextCleaner actually reclaim localCheckpoint
            # blocks (its own periodic GC defaults to 30 min — longer
            # than the whole bench), so block-manager state stays
            # bounded across the 115-entry session instead of
            # accumulating into the uniform drift r06 measured.
            df = None
            gc.collect()
            if (i + 1) % 20 == 0:
                spark.sparkContext._jvm.System.gc()

    total = round(
        etl_sec
        + b2_sec
        + ml_sec
        + results["stream_etl_24k"]
        + sum(results[q] for q in BENCH_QUERIES),
        3,
    )
    line = json.dumps(
        {
            "metric": "bench_total_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": results,
            # fresh-session medians — the stable cross-round basis
            "sentinels": sentinels,
            "sentinel_reps": sentinel_reps,
            # 1-min load sampled before each sentinel child (first
            # sample predates any child: foreign load by construction)
            "sentinel_load1_before": sentinel_load,
            # contamination retries: both attempts + which one the
            # median came from (empty dict = clean phase)
            "sentinel_retries": sentinel_retries,
            "cpus": os.cpu_count(),
            "bench_gc": bench_gc,
            "sf": sf,
        }
    )
    # truncation-proof: the driver's bounded tail capture once cut the
    # FRONT of this (long) line, losing the headline metrics — so the
    # full JSON also lands in a file, and the line prints FIRST (any
    # trailing Spark-shutdown noise then can't displace it in a tail).
    print(line, flush=True)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_out.json")
    with open(out_path, "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--sentinel-child":
        _sentinel_child(sys.argv[2])
    else:
        main()
