"""Registry-order contract: the grading driver hard-checks a prefix of
the registry (50 entries in round 1), so ordering is part of the
correctness surface — every query that must produce a hard signal has
to sit inside the window, and nothing inside it may be rows-only."""

from __future__ import annotations

from big_data_spark.queries import QUERIES

DRIVER_WINDOW = 50

# The scale-critical dedup/similarity tail (round-1 verdict: these had
# no hard correctness signal because they registered past the window).
MUST_BE_IN_WINDOW = {
    "q47_lsh_dedup_groups",
    "q53_lsh_verified_pairs",
    "q60_cosine_topk",
    "q61_centroid_distance",
    "q62_embedding_near_dup",
    "q63_embedding_sign_buckets",
    "q35_skill_match_scores",
    "q64_ivf_ann",
    "q65_bucketed_segment_orders",
    "q66_lsh_dedup_components",
    "q67_corpus_prep",
    "q68_media_features",
    "q54_winnowing_fingerprints",
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
