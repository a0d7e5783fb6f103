"""Registry-order contract: the grading driver hard-checks a prefix of
the registry (50 entries in round 1), so ordering is part of the
correctness surface — every query that must produce a hard signal has
to sit inside the window, and nothing inside it may be rows-only."""

from __future__ import annotations

import glob
import json
import os

from big_data_spark.queries import QUERIES

DRIVER_WINDOW = 50

# Round 8: no rows-only entries spend window slots. m01/m02/m04 got
# their driver-executed rows-only rows in r06 — the only hard signal
# an iterative MLlib fit can ever get — and their deterministic
# post-fit readouts are now oracle-backed companions (q186/q187).
ROWS_ONLY_WINDOW_EXCEPTIONS: set[str] = set()

# Round-12 slot plan (VERDICT r11 order #3 — steady state): 12
# permanent anchors, the 2 residual-PQ certification anchors (q75,
# q152), 6 round-9 tokenizer additions (3x green) + 3 round-10
# additions (2x green) + 3 round-11 additions (1x green) kept as
# re-confirmations, the 3 round-12 additions (q200 int32 token-id
# bundle encode, q201 packed id shards through the persisted files,
# q202 packing policies — first hard check), 1 re-promotion (q84,
# the packing family's assignment query re-confirmed beside its
# id-level descendants), and 20 re-confirmations. The 4x-green
# round-8 cohort (q184-q187) rotated out with in-window machinery
# reps (see _DRIVER_WINDOW_ORDER notes).
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
    # -- VERDICT r07 order #1: residual-PQ certification anchors --
    "q75_pq_adc_topk",
    "q152_filtered_ann",
    # -- round-12 additions: FIRST hard driver check --
    "q200_token_id_encode",
    "q201_packed_id_shards",
    "q202_packing_policies",
    # -- re-promotion: packing-family assignment query --
    "q84_sequence_packing",
    # -- round-9 additions, kept as 3x-green re-confirmations --
    "q188_bpe_merge_sequence",
    "q189_bpe_encoded_vocab",
    "q190_unigram_seed_vocab",
    "q191_unigram_roundtrip",
    "q192_corpus_encode_roundtrip",
    "q193_tokenizer_compression",
    # -- round-10 additions, kept as 2x-green re-confirmations --
    "q194_longest_match_encode",
    "q195_byte_fallback_encode",
    "q196_pretokenized_vocab",
    # -- round-11 additions, kept as 1x-green re-confirmations --
    "q197_tokenizer_capstone",
    "q198_token_budget_real_counts",
    "q199_packed_sequences",
    # -- re-confirmations (20): freshest greens --
    "q148_windowed_funnel",
    "q151_srm_check",
    "q154_khop_reachability",
    "q155_weighted_quantiles",
    "q158_golden_record",
    "q159_quota_sample",
    "q163_cusum_changepoint",
    "q164_calibration_bins",
    "q168_interval_union",
    "q169_fk_orphan_audit",
    "q170_duplication_fraction",
    "q172_association_rules",
    "q175_bigram_logprob",
    "q176_langid_confusion",
    "q177_token_entropy",
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


def test_no_unchecked_entry_outside_window():
    """The steady-state rotation rule (VERDICT r07 order #2), asserted
    STRUCTURALLY: a registry entry that has never received a hard
    driver CORRECTNESS row must sit inside the current window — the
    committed CORRECTNESS_r*.json files ARE the ledger, so additions
    cannot silently accumulate certification debt in the tail. (An
    entry inside the window is checked this round by construction;
    once its green row is committed it may rotate out.)"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    ledger = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    assert ledger, "no CORRECTNESS_r*.json ledger found"
    for path in ledger:
        with open(path) as f:
            checked |= set(json.load(f))
    window = set(list(QUERIES)[:DRIVER_WINDOW])
    never_checked = set(QUERIES) - checked
    stranded = never_checked - window
    assert not stranded, (
        f"entries with no hard driver row sit outside the window "
        f"(certification debt re-accumulating): {sorted(stranded)}"
    )
