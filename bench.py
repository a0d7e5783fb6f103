"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is total wall-clock over the bench set; per-query
seconds are reported individually. B1 (ETL-chain throughput) also
reports rows/s in the queries map as etl_rows_per_s.
"""

from __future__ import annotations

import json
import os
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
]

ETL_ROWS = int(os.environ.get("SPARK_GRAFT_ETL_ROWS", "850000"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
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
    import json as _json

    from big_data_spark.fixtures import JOBS_COLUMNS, JOBS_CORPUS
    from big_data_spark.streaming import stream_clean_postings

    sdir = tempfile.mkdtemp(prefix="bench_stream_")
    src = os.path.join(sdir, "src")
    os.makedirs(src)
    for part in range(4):
        with open(os.path.join(src, f"p{part}.json"), "w") as f:
            for rep in range(500):
                for i, row in enumerate(JOBS_CORPUS):
                    if i % 4 != part:
                        continue
                    rec = dict(zip(JOBS_COLUMNS, row))
                    rec["event_time"] = "2024-01-01 10:00:00"
                    f.write(_json.dumps(rec) + "\n")
    t0 = time.perf_counter()
    q = stream_clean_postings(
        spark, src, os.path.join(sdir, "sink"), os.path.join(sdir, "ckpt")
    )
    q.awaitTermination(300)
    results["stream_etl_24k"] = round(time.perf_counter() - t0, 3)
    shutil.rmtree(sdir, ignore_errors=True)

    for name in BENCH_QUERIES:
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
    main()
