"""Registry-order contract: the grading driver hard-checks a prefix of
the registry (50 entries in round 1), so ordering is part of the
correctness surface — every query that must produce a hard signal has
to sit inside the window, and nothing inside it may be rows-only."""

from __future__ import annotations

from big_data_spark.queries import QUERIES

DRIVER_WINDOW = 50

# Queries that have never had a hard driver CORRECTNESS row, plus the
# scale-critical dedup/similarity tail. Rotation rule (round-3, still
# in force): a query may leave the window only once it has a green
# driver row in some round; never-checked oracle queries take priority
# for slots. Round-5 update: the entire round-4 window went green in
# CORRECTNESS_r04 (19 first-time rows among them), so the 24
# twice-green entries rotated out (q33/q34/q51/q55-q59/q65/q68/q69/
# q76-q88 band) and tranche 1 of the certification plan promoted
# q108-q131 for their FIRST hard check. The set below is exactly what
# round 5's window must hard-check or re-confirm.
MUST_BE_IN_WINDOW = {
    # ROUND-5 PROMOTIONS — never driver-checked (tranche 1)
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
    # single-green round-4 rows staying for a second confirmation
    "q89_volume_shipping",
    "q90_product_type_profit",
    "q91_brand_size_disjunction",
    "q92_simhash_hamming_pairs",
    "q93_stratified_split",
    "q94_length_curriculum",
    "q95_group_topk_sample",
    "q96_tfidf_cosine_pairs",
    "q97_shuffle_shards",
    "q98_returned_item_customers",
    "q99_customer_order_distribution",
    "q100_batch_ann_topk",
    "q101_corpus_health",
    "q102_market_share",
    "q103_top_supplier",
    "q104_part_supplier_variety",
    "q105_excess_shippers",
    "q106_segment_dedup",
    "q107_overlap_chunks",
    "q35_skill_match_scores",
    "q64_ivf_ann",
    "q75_pq_adc_topk",
    # permanent multi-green anchors (flagship / ETL / LSH / corpus)
    "q01_pricing_summary",
    "q32_job_etl_full",
    "q66_lsh_dedup_components",
    "q67_corpus_prep",
}


def test_window_is_all_oracle_backed():
    window = list(QUERIES)[:DRIVER_WINDOW]
    rows_only = [n for n in window if QUERIES[n].oracle is None]
    assert not rows_only, f"rows-only entries waste driver budget: {rows_only}"


def test_scale_tail_inside_window():
    window = set(list(QUERIES)[:DRIVER_WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"scale-path queries outside driver window: {missing}"


def test_demoted_entries_still_registered():
    # Demotion out of the window must not silently drop coverage —
    # every demoted query keeps its oracle and its local parity check.
    tail = list(QUERIES)[DRIVER_WINDOW:]
    orphans = [
        n for n in tail if QUERIES[n].oracle is None and not n.startswith("m")
    ]
    assert not orphans, f"non-ML rows-only entries in tail: {orphans}"
