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
# for slots. Round-4 update: q34/q47/q53/q54/q60/q63 earned their
# rows (1-3 greens each) and rotated out for the round-4 additions;
# the never-checked set below is exactly what round 4's window must
# hard-check for the first time.
MUST_BE_IN_WINDOW = {
    # never driver-checked before round 4 (round-3 additions)
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
    # never driver-checked round-4 additions promoted this round
    "q102_market_share",
    "q103_top_supplier",
    "q104_part_supplier_variety",
    "q105_excess_shippers",
    "q106_segment_dedup",
    "q107_overlap_chunks",
    # scale-family anchors that stay until the family is multi-green
    "q35_skill_match_scores",
    "q64_ivf_ann",
    "q65_bucketed_segment_orders",
    "q66_lsh_dedup_components",
    "q67_corpus_prep",
    "q68_media_features",
    "q75_pq_adc_topk",
    "q77_corpus_mixing",
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
