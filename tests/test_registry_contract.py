"""Registry-order contract: the grading driver hard-checks a prefix of
the registry (50 entries in round 1), so ordering is part of the
correctness surface — every query that must produce a hard signal has
to sit inside the window, and nothing inside it may be rows-only."""

from __future__ import annotations

from big_data_spark.queries import QUERIES

DRIVER_WINDOW = 50

# Round 7: no rows-only entries spend window slots. m01/m02/m04 got
# their driver-executed rows-only rows in r06 — the only hard signal
# an iterative MLlib fit can ever get — so the slots go to the
# oracle-backed certification backlog instead.
ROWS_ONLY_WINDOW_EXCEPTIONS: set[str] = set()

# Queries that have never had a hard driver CORRECTNESS row, plus the
# anchors pinning each backlog family. Rotation rule (round-3, still
# in force): a query may leave the window only once it has a green
# driver row in some round; never-checked oracle queries take priority
# for slots. Round-7 update (VERDICT r06 order #1): CORRECTNESS_r06
# went 50/50 green, so the ENTIRE 38-entry certification backlog
# (q146–q183 — every registry entry without a hard driver row)
# promotes at once, alongside 12 multi-green anchors; 39 green
# survivors demote with in-window representatives documented at
# _DRIVER_WINDOW_ORDER. Registry additions are frozen this round
# (order #2). The set below is exactly what round 7's window must
# hard-check or re-confirm.
MUST_BE_IN_WINDOW = {
    # -- anchors (12): multi-green machinery pins --
    "q01_pricing_summary",
    "q32_job_etl_full",
    "q05_nation_revenue",
    "q66_lsh_dedup_components",
    "q67_corpus_prep",
    "q92_simhash_hamming_pairs",
    "q101_corpus_health",
    "q106_segment_dedup",
    "q112_knn_join",
    "q120_containment_pairs",
    "q137_bm25_topk",
    "q64_ivf_ann",
    # -- round-5 additions: FIRST hard driver check --
    "q146_pagerank",
    "q147_weighted_sample",
    "q148_windowed_funnel",
    "q149_retrieval_metrics",
    "q150_cuped_adjustment",
    "q151_srm_check",
    "q152_filtered_ann",
    "q153_join_explosion_audit",
    # -- round-6 additions: FIRST hard driver check --
    "q154_khop_reachability",
    "q155_weighted_quantiles",
    "q156_largest_remainder_alloc",
    "q157_cdc_log_compaction",
    "q158_golden_record",
    "q159_quota_sample",
    "q160_last_touch_attribution",
    "q161_revenue_lorenz",
    "q162_chisq_independence",
    "q163_cusum_changepoint",
    "q164_calibration_bins",
    "q165_int8_quantization",
    "q166_ks_two_sample",
    "q167_zipf_slope",
    "q168_interval_union",
    "q169_fk_orphan_audit",
    "q170_duplication_fraction",
    "q171_token_pmi",
    "q172_association_rules",
    "q173_benford_audit",
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
}


def test_window_is_all_oracle_backed():
    window = list(QUERIES)[:DRIVER_WINDOW]
    rows_only = [
        n
        for n in window
        if QUERIES[n].oracle is None and n not in ROWS_ONLY_WINDOW_EXCEPTIONS
    ]
    assert not rows_only, f"rows-only entries waste driver budget: {rows_only}"


def test_window_exactly_filled():
    # MUST_BE_IN_WINDOW is the complete slot plan this round — if it
    # and the window ever disagree in size, a slot is being wasted or
    # a promotion silently fell out of the prefix.
    assert len(MUST_BE_IN_WINDOW) == DRIVER_WINDOW


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
