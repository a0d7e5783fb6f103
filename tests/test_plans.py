"""Physical-plan shape assertions: the 100-TB guarantees
(pushdown, pruning, broadcast, bounded shuffles) checked as code.
"""

from __future__ import annotations

import pytest

from big_data_spark.plans import (
    count_broadcast_joins,
    count_scans,
    count_shuffles,
    executed_formatted_plan,
    formatted_plan,
    has_pushed_filters,
    has_wholestage_codegen,
    read_schema_columns,
)
from big_data_spark.queries import QUERIES

from .conftest import SF_ORACLE


def q(spark, name):
    return QUERIES[name].fn(spark, SF_ORACLE)


def test_range_filter_pushdown_and_pruning(spark):
    df = q(spark, "q03_range_filter")
    # all conjuncts reach the parquet scan
    assert has_pushed_filters(
        df, "l_quantity", "l_discount", "l_returnflag", "l_shipdate"
    ), formatted_plan(df)
    # scan reads only the needed columns, not the 11-column table
    cols = set(read_schema_columns(df))
    assert "l_comment" not in cols and "l_tax" not in cols
    assert len(cols) <= 7, cols


def test_q01_scan_pruned_to_agg_columns(spark):
    cols = set(read_schema_columns(q(spark, "q01_pricing_summary")))
    needed = {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
    }
    assert cols == needed, cols


def test_star_join_broadcasts_all_dims(spark):
    df = q(spark, "q05_nation_revenue")
    # supplier, nation, region all broadcast: no shuffle before agg
    assert count_broadcast_joins(df) == 3, formatted_plan(df)
    # the only exchange is the final aggregation (AQE may add none pre-agg)
    assert count_shuffles(df) <= 1, formatted_plan(df)


def test_topk_avoids_global_sort(spark):
    plan = formatted_plan(q(spark, "q02_topk_orders"))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_window_topn_uses_group_limit(spark):
    # Spark pushes rn<=3 into WindowGroupLimit before the shuffle
    plan = formatted_plan(q(spark, "q08_top3_orders_per_customer"))
    assert "WindowGroupLimit" in plan, plan


def test_etl_chain_is_shuffle_free_and_codegen(spark):
    from big_data_spark.fixtures import synthetic_postings
    from big_data_spark.operators.job_etl import clean_job_postings

    df = clean_job_postings(synthetic_postings(spark, 1000), deterministic_id=True)
    assert count_shuffles(df) == 0, formatted_plan(df)
    assert has_wholestage_codegen(df)


def test_sessionization_single_shuffle(spark):
    # lag window + running-sum window + groupBy all share the
    # user_id hash partitioning: exactly one exchange
    df = q(spark, "q23_event_sessions")
    assert count_shuffles(df) == 1, formatted_plan(df)


def test_lsh_dedup_no_cartesian(spark):
    plan = formatted_plan(q(spark, "q47_lsh_dedup_groups"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_topk_broadcasts_query_vector(spark):
    plan = formatted_plan(q(spark, "q60_cosine_topk"))
    assert "TakeOrderedAndProject" in plan
    # single-row query vector joins via broadcast, never a shuffle join
    assert "SortMergeJoin" not in plan


def test_ivf_ann_broadcasts_index_structures(spark):
    """q64: centroids, probe list, and query vector all ride
    broadcast joins (hash for the keyed probe join, nested-loop for
    the 1-row query-vector attach) — the corpus side never shuffles
    for assignment, and nothing degenerates to a cartesian product."""
    df = q(spark, "q64_ivf_ann")
    plan = formatted_plan(df)
    n_bcast = sum(
        plan.count(node)
        for node in ("BroadcastHashJoin", "BroadcastNestedLoopJoin")
    )
    assert n_bcast >= 3, plan
    assert "CartesianProduct" not in plan


def test_filtered_ann_pushes_predicate_and_broadcasts(spark):
    """q152: the metadata predicate applies BEFORE assignment — the
    label filter reaches the parquet scan (PushedFilters), so the
    argmin and candidate scan only touch qualifying rows — and the
    index structures ride broadcasts like q64 (no cartesian)."""
    # ordering-robust: another module's cached embeddings table would
    # swap the scan for InMemoryRelation and hide PushedFilters
    spark.catalog.clearCache()
    df = q(spark, "q152_filtered_ann")
    plan = formatted_plan(df)
    assert has_pushed_filters(df, "label", "vec_id"), plan
    n_bcast = sum(
        plan.count(node)
        for node in ("BroadcastHashJoin", "BroadcastNestedLoopJoin")
    )
    assert n_bcast >= 3, plan
    assert "CartesianProduct" not in plan


def test_corpus_prep_no_python_and_digest_shuffles(spark):
    """q67: the whole prep chain stays JVM-side (no Python eval
    nodes), and the quality/lang gates fuse into the scan stage."""
    df = q(spark, "q67_corpus_prep")
    plan = formatted_plan(df)
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan
    # every shuffle keys on a 16B digest or doc_id — and there are
    # few of them (fingerprint window, band agg, doc agg, join-backs)
    assert count_shuffles(df) <= 6, plan


def test_media_features_is_arrow_batched(spark):
    """q68: the decode step is a MapInPandas (Arrow-batched) node —
    never a row-at-a-time Python UDF."""
    df = q(spark, "q68_media_features")
    plan = formatted_plan(df)
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time path


def test_small_quantity_revenue_broadcasts_dim_only(spark):
    """q69: with auto-broadcast off (the 100-TB situation — the
    per-part thresholds table is parts-sized, unbroadcastable), the
    hinted brand dim STILL broadcasts while the thresholds join falls
    back to a keyed shuffle join, never a nested-loop."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q(spark, "q69_small_quantity_revenue")
        plan = formatted_plan(df)
        assert count_broadcast_joins(df) == 1, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_asof_join_single_shuffle_no_pairs(spark):
    """q55: the union-window as-of form must plan as window-over-sort
    with NO join node at all — the whole point is that no pair join
    (hash, sort-merge, or nested-loop) ever materializes."""
    df = q(spark, "q55_purchase_attribution_asof")
    plan = formatted_plan(df)
    assert "Window" in plan
    for node in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan, node


def test_range_join_binned_is_hash_join(spark):
    """q56: the binned interval join must be a keyed join on the time
    bucket, never the nested-loop a raw range predicate would plan."""
    df = q(spark, "q56_incident_click_range_join")
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_pii_redaction_is_map_only(spark):
    """q78: the PII scrub is pure per-row regexp work — no shuffle,
    no Python, stays in whole-stage codegen."""
    df = q(spark, "q78_pii_redaction")
    assert count_shuffles(df) == 0, formatted_plan(df)
    assert "PythonUDF" not in formatted_plan(df)
    assert has_wholestage_codegen(df)


def test_decontamination_broadcasts_benchmark(spark):
    """q80: the benchmark gram set rides a broadcast hash join — the
    corpus never shuffles against the benchmark; at 100 TB the eval
    suite is KBs while the corpus is the 100 TB."""
    df = q(spark, "q80_decontamination")
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_late_sole_shippers_decorrelates_to_hash_joins(spark):
    """q82: EXISTS / NOT EXISTS must decorrelate to keyed semi/anti
    hash joins on l_orderkey — never a per-row subquery or
    nested-loop over lineitem."""
    df = q(spark, "q82_late_sole_shippers")
    plan = formatted_plan(df)
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_corpus_mixing_is_broadcast_map_only(spark):
    """q77: mixing must fuse into the scan — one broadcast join with
    the tiny weights dim, no shuffle of the corpus side at all."""
    df = q(spark, "q77_corpus_mixing")
    plan = formatted_plan(df)
    assert count_broadcast_joins(df) == 1, plan
    assert count_shuffles(df) == 0, plan
    for node in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan, node


def test_volume_shipping_broadcasts_prefiltered_dims(spark):
    """q89 (Q7 shape): nation filters must reach the dims BEFORE the
    fact joins, and nation/supplier sides broadcast — the only real
    shuffles are lineitem⋈orders(⋈customer) and the final agg."""
    df = q(spark, "q89_volume_shipping")
    plan = formatted_plan(df)
    assert count_broadcast_joins(df) >= 3, plan
    assert "CartesianProduct" not in plan
    # the n_name IN filter is applied at the nation scans, not post-join
    assert has_pushed_filters(df, "n_name"), plan


def test_brand_disjunction_prunes_part_scan(spark):
    """q91 (Q19 shape): the OR-of-ANDs part predicate must push into
    the part parquet scan, and the pruned part side must broadcast —
    lineitem is never shuffled for the join."""
    df = q(spark, "q91_brand_size_disjunction")
    plan = formatted_plan(df)
    assert count_broadcast_joins(df) == 1, plan
    assert has_pushed_filters(df, "p_brand"), plan
    assert "SortMergeJoin" not in plan


def test_length_curriculum_window_runs_on_histogram(spark):
    """q94: the cumulative window must consume the token-count
    HISTOGRAM (post-aggregation), never the raw corpus — i.e. the
    Window sits above a HashAggregate, and the bucket map joins back
    via broadcast."""
    df = q(spark, "q94_length_curriculum")
    plan = formatted_plan(df)
    assert "Window" in plan, plan
    assert count_broadcast_joins(df) >= 1, plan
    # corpus rows flow through exactly one aggregate before the window:
    # histogram agg (+ final bucket agg) — no corpus-wide sort feeds it
    assert plan.index("Window") > plan.index("HashAggregate"), plan


def test_group_topk_sample_uses_group_limit(spark):
    """q95: the rn<=5 filter must push into WindowGroupLimit so each
    partition keeps at most k rows per group before the shuffle."""
    plan = formatted_plan(q(spark, "q95_group_topk_sample"))
    assert "WindowGroupLimit" in plan, plan


def test_tfidf_pairs_inverted_index_join(spark):
    """q96: doc pairs must meet through the token equi-join (inverted
    index) — never an all-pairs nested loop; the 1-row corpus count
    broadcasts."""
    df = q(spark, "q96_tfidf_cosine_pairs")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert count_broadcast_joins(df) >= 1, plan


def test_batch_ann_uses_group_limit_and_broadcast(spark):
    """q100: the probe set broadcasts and the per-probe top-k pushes
    into WindowGroupLimit — the shuffle carries probes x k rows."""
    df = q(spark, "q100_batch_ann_topk")
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan, plan
    # the probe fanout is an intentional broadcast nested-loop (5-row
    # build side, no join key) — the corpus side must never shuffle
    # for it and the plan must never fall back to a cartesian product
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan


def test_returned_items_pushdown_and_topk(spark):
    """q98 (Q10 shape): returnflag + orderdate filters reach the fact
    scans, nation broadcasts, and the top-20 is TakeOrderedAndProject
    — no global sort of the grouped result."""
    df = q(spark, "q98_returned_item_customers")
    plan = formatted_plan(df)
    assert has_pushed_filters(df, "l_returnflag", "o_orderdate"), plan
    assert "TakeOrderedAndProject" in plan, plan
    assert count_broadcast_joins(df) >= 1, plan


def test_shuffle_shards_no_global_sort(spark):
    """q97: the training-order shuffle must be 64 parallel per-shard
    sorts (hash partitioning), never a corpus-wide range sort."""
    plan = formatted_plan(q(spark, "q97_shuffle_shards"))
    assert "rangepartitioning" not in plan, plan
    assert "hashpartitioning" in plan, plan


def test_simhash_hamming_band_join_no_cartesian(spark):
    """q92: candidate generation must be a keyed equi-join on
    (band_id, band_val) — never a nested-loop/cartesian all-pairs."""
    df = q(spark, "q92_simhash_hamming_pairs")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_64bit_band_join_no_cartesian(spark):
    """The 64-bit/4x16-band scale form keeps the same plan shape: a
    keyed equi-join on (band_id, band_val) with 65,536 buckets per
    band — the parameterization exists precisely so the candidate
    work stays bucketed past ~10^8 distinct signatures."""
    from big_data_spark.catalog import load_table
    from big_data_spark.operators.simhash import simhash_hamming_pairs

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    df = simhash_hamming_pairs(docs, n_bits=64, n_bands=4, max_hamming=3)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_market_share_broadcasts_all_dims(spark):
    """q102 (TPC-H Q8 shape): part/supplier/nation/region all arrive
    via broadcast — the only shuffles are the two fact joins
    (lineitem⋈orders, orders⋈customer-semi) plus the year agg."""
    df = q(spark, "q102_market_share")
    plan = formatted_plan(df)
    assert count_broadcast_joins(df) >= 3, plan
    assert "CartesianProduct" not in plan
    # part filter must reach the part scan, not post-join
    assert has_pushed_filters(df, "p_type"), plan


def test_top_supplier_max_is_broadcast_not_rescan(spark):
    """q103 (TPC-H Q15 shape): the MAX 'scalar subquery' must come
    back as a broadcast join, and lineitem is scanned with the
    ship-date filter pushed down."""
    df = q(spark, "q103_top_supplier")
    plan = formatted_plan(df)
    assert count_broadcast_joins(df) >= 1, plan
    assert has_pushed_filters(df, "l_shipdate"), plan


def test_part_variety_anti_join_is_broadcast(spark):
    """q104 (TPC-H Q16 shape): the supplier deny-list NOT IN must plan
    as a broadcast LEFT ANTI hash join; the part attribute filters
    reach the part scan."""
    df = q(spark, "q104_part_supplier_variety")
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert has_pushed_filters(df, "p_size"), plan
    assert "CartesianProduct" not in plan


def test_excess_shippers_semi_joins_no_fact_rescan(spark):
    """q105 (TPC-H Q20 shape): both IN subqueries plan as (broadcast)
    semi joins; the part name prefix filter is pushed to the part
    scan so lineitem shrinks before any aggregation."""
    df = q(spark, "q105_excess_shippers")
    plan = formatted_plan(df)
    assert "LeftSemi" in plan, plan
    assert has_pushed_filters(df, "p_name"), plan
    assert "CartesianProduct" not in plan


def test_segment_dedup_winner_is_digest_agg_not_window(spark):
    """q106: the first-occurrence election must be a hash aggregate
    over (digest → min struct) with map-side partial combine — never
    a corpus-wide window sort partitioned by digest."""
    df = q(spark, "q106_segment_dedup")
    plan = formatted_plan(df)
    assert "Window" not in plan, plan
    assert "partial_min" in plan or "min(" in plan.lower(), plan
    assert "CartesianProduct" not in plan


def test_overlap_chunks_is_map_only(spark):
    """q107: stride chunking is explode+project — zero exchanges, so
    it fuses into the parquet scan."""
    df = q(spark, "q107_overlap_chunks")
    assert count_shuffles(df) == 0, formatted_plan(df)


def test_source_overlap_join_is_keyed_not_cartesian(spark):
    """q108: the source×source overlap join must key on the shingle
    digest (SortMergeJoin/ShuffledHashJoin on h), with the inequality
    as a post-join filter — never a nested loop over doc pairs."""
    df = q(spark, "q108_source_shingle_overlap")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_gap_fill_window_is_partitioned_and_filter_pushed(spark):
    """q109: the sparse-event filter must reach the events scan, and
    the LOCF window must partition by event_type (bounded per-key
    state), never run unpartitioned."""
    df = q(spark, "q109_gap_fill")
    plan = formatted_plan(df)
    assert has_pushed_filters(df, "value"), plan
    assert "Window" in plan, plan
    assert "partitionBy=[]" not in plan and "SinglePartition, Window" not in plan, plan


def test_unigram_quality_model_is_broadcast(spark):
    """q110: the scoring join (tokens ⋈ vocab log-probs) must be a
    broadcast hash join — the model ships to executors, the exploded
    token stream never shuffles for the lookup."""
    df = q(spark, "q110_unigram_quality")
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan


def test_important_stock_single_fact_scan(spark):
    """q111 (TPC-H Q11 shape): nation/supplier broadcast into the
    fact; the HAVING-fraction total re-aggregates the same supply
    subplan, so AQE must plan a ReusedExchange — the lineitem scan +
    partial agg physically executes once, and the total branch reads
    the reused shuffle output."""
    df = q(spark, "q111_important_stock")
    plan = formatted_plan(df)
    assert count_broadcast_joins(df) >= 2, plan
    assert "CartesianProduct" not in plan
    df.collect()  # AQE finalizes reuse at execution time
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed, executed


def test_knn_join_is_bucket_keyed_with_group_limit(spark):
    """q112: the self-join must key on the LSH bucket (hash join, no
    cartesian) and the per-vector top-3 must compile to
    WindowGroupLimit so only k rows per vector survive the window
    shuffle."""
    df = q(spark, "q112_knn_join")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_token_budget_mix_is_broadcast_map_only(spark):
    """q113: the fraction dim joins via broadcast and the keep
    predicate is per-row — the corpus side must not shuffle (the only
    exchanges belong to the two tiny aggregates)."""
    df = q(spark, "q113_token_budget_mix")
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_quality_percentile_cut_window_on_histogram(spark):
    """q114: the cumulative window must run over the per-source score
    HISTOGRAM, and the threshold table must broadcast back — the doc
    side never enters a per-source window partition."""
    df = q(spark, "q114_quality_percentile_cut")
    plan = formatted_plan(df)
    assert "Window" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # the window input is the (source, score) aggregate, not documents:
    # the plan's Window node sits above a HashAggregate, and the doc
    # branch reaches the join through scan+project only
    assert "CartesianProduct" not in plan


def test_intradoc_dedup_is_map_only(spark):
    """q115: first-occurrence filtering is a higher-order expression
    per row — zero exchanges, fuses into the scan."""
    df = q(spark, "q115_intradoc_dedup")
    assert count_shuffles(df) == 0, formatted_plan(df)


def test_unpivot_is_single_scan(spark):
    """q116: stack() melts N attributes in one pass — a generator
    projection over a single part scan, no self-union of scans."""
    df = q(spark, "q116_part_attr_unpivot")
    plan = formatted_plan(df)
    assert plan.lower().count("scan parquet") <= 1 or plan.count("Generate") >= 1, plan
    assert "Union" not in plan, plan


def test_grouping_sets_single_expand(spark):
    """q117: GROUPING SETS compiles to one Expand + one aggregate —
    the scan is read once, not once per cell set."""
    df = q(spark, "q117_grouping_sets")
    plan = formatted_plan(df)
    # one Expand node (tree line "Expand (n)" + one detail heading)
    assert plan.count("+- Expand") == 1, plan
    assert plan.lower().count("scan parquet") <= 2, plan  # tree + detail
    assert "Union" not in plan, plan


def test_time_weighted_avg_shares_partitioning(spark):
    """q118: the lead window and the per-user aggregate share the
    user_id hash partitioning — exactly one exchange (q23's shape)."""
    df = q(spark, "q118_time_weighted_avg")
    assert count_shuffles(df) == 1, formatted_plan(df)


def test_containment_pairs_df_bounded_no_cartesian(spark):
    """q120: the shingle self-join must be keyed on the digest with
    the df cap applied as a broadcast LEFT ANTI against the tiny
    hot-shingle list (map-side drop, no hot posting list ever
    gathers) — no cartesian/nested-loop."""
    df = q(spark, "q120_containment_pairs")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_bpe_pairs_counted_over_vocab_with_topk(spark):
    """q121: bigram counting runs over the distinct-word table (two
    keyed aggregates), and the top-20 compiles to
    TakeOrderedAndProject — no global sort of the pair table."""
    df = q(spark, "q121_bpe_pair_counts")
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_topk_with_ties_uses_rank_group_limit(spark):
    """q124: rank-based top-k must also compile to WindowGroupLimit
    (Spark 3.5+ supports rank group limits), over the histogram-sized
    (flag, quantity) aggregate."""
    df = q(spark, "q124_topk_with_ties")
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan, plan


def test_native_mad_no_python(spark):
    """q125: the robust-stats computation stays entirely JVM-side —
    no Arrow/Python eval nodes anywhere in the plan."""
    df = q(spark, "q125_native_mad")
    plan = formatted_plan(df)
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan, plan
    assert "FlatMapGroupsInPandas" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_rolling_time_window_single_user_shuffle(spark):
    """q126: the range-frame window shuffles once on user_id; the only
    other exchange is the presentation sort. No Python anywhere."""
    df = q(spark, "q126_rolling_time_window")
    plan = formatted_plan(df)
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    assert "Window" in plan and "PythonUDF" not in plan, plan


def test_fuzzy_name_pairs_length_blocked_no_cartesian(spark):
    """q127: the edit-distance join is an equi-join on the exploded
    length band — never a cartesian/nested-loop over the vocab."""
    df = q(spark, "q127_fuzzy_name_pairs")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_copurchase_pairs_basket_local_no_join(spark):
    """q128: pairs generate basket-locally from the collected item
    array — NO join node at all, the top-50 compiles to
    TakeOrderedAndProject, and the mega-basket guard (64 smallest
    parts per order) pushes into WindowGroupLimit so a pathological
    basket truncates during the sort instead of collecting whole."""
    df = q(spark, "q128_copurchase_pairs")
    plan = formatted_plan(df)
    assert "Join" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    # cap window + support count — the dense_rank cap needs no
    # separate distinct exchange (collect_set dedups) and the basket
    # build reuses the cap window's orderkey partitioning
    assert count_shuffles(df) <= 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_quality_classifier_codegen_single_exchange(spark):
    """q129: hashed-linear scoring explodes into codegen'd md5 weights
    and ONE map-side-combinable per-doc aggregate — a single hash
    exchange (plus the presentation sort), no joins, zero Python.
    The md5 weight must sit under WholeStageCodegen, not a
    CodegenFallback higher-order fold (the fold measured ~30 us/token
    interpreted)."""
    df = q(spark, "q129_quality_classifier")
    plan = formatted_plan(df)
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan, plan
    # codegen ids only annotate the post-run plan under AQE
    assert "codegen id" in executed_formatted_plan(df)


def test_sliding_active_users_explodes_pairs_not_events(spark):
    """q133: the 7x window-membership explode runs on the deduped
    (day,user) pair table after a keyed aggregate — bounded shuffles,
    no cartesian, no Python."""
    df = q(spark, "q133_sliding_active_users")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    # every exchange is keyed on pair/day columns of the DEDUPED pair
    # table (2 dedups, 2 aggs, day-keyed join, final sort) — all
    # pair-table-sized; raw events shuffle exactly once (first dedup)
    assert count_shuffles(df) <= 7, plan
    assert "PythonUDF" not in plan, plan


def test_key_skew_audit_windows_only_top10(spark):
    """q134: the key table top-10 compiles to TakeOrderedAndProject
    BEFORE the rank/cumsum window — the single-partition window sees
    10 rows by construction, never the keyspace."""
    df = q(spark, "q134_key_skew_audit")
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert count_shuffles(df) <= 3, plan


def test_join_explosion_audit_windows_only_top10(spark):
    """q153: same discipline as q134 — the per-key pair counts top-10
    compiles to TakeOrderedAndProject before the rank/cumsum window,
    so the single-partition window sees 10 rows, never the keyspace."""
    df = q(spark, "q153_join_explosion_audit")
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert count_shuffles(df) <= 3, plan
    assert "CartesianProduct" not in plan, plan


def test_cuped_is_two_aggs_and_broadcast(spark):
    """q150: CUPED never materializes a per-user adjusted column —
    the plan is the user-level conditional agg feeding two
    sufficient-statistic aggs plus broadcast join-backs; no window,
    no cartesian beyond the 1-row broadcast attach."""
    df = q(spark, "q150_cuped_adjustment")
    plan = formatted_plan(df)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert count_shuffles(df) <= 6, plan


def test_srm_is_bounded_conditional_counts(spark):
    """q151: enrollment dedup + day-keyed conditional counts — both
    map-side combinable aggs; no window over raw events, no python."""
    df = q(spark, "q151_srm_check")
    plan = formatted_plan(df)
    assert "Window" not in plan, plan
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan, plan
    assert count_shuffles(df) <= 4, plan


def test_peak_concurrency_two_level_sweep(spark):
    """q135: the in-bucket cumsum window is hash-partitioned on the
    hour bucket; the only unpartitioned window runs over the bucket
    HISTOGRAM (post-aggregation), never the boundary-point table."""
    df = q(spark, "q135_peak_concurrency")
    plan = formatted_plan(df)
    assert "hashpartitioning(bucket" in plan, plan
    assert plan.count("Window") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_snapshot_diff_joins_digests_only(spark):
    """q136: the full-outer reconciliation join carries only
    (key, md5 digest) per side — the md5 projects before the
    exchange, so the shuffle moves 32B/row regardless of row width."""
    df = q(spark, "q136_snapshot_diff")
    plan = formatted_plan(df)
    assert "FullOuter" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # digest computed below every exchange: no raw content column in
    # any Exchange node's input attribute list
    for section in plan.split("\n\n"):
        if section.startswith("(") and ") Exchange" in section.splitlines()[0]:
            assert "o_orderstatus" not in section, section


def test_bm25_scores_query_terms_only(spark):
    """q137: the isin(query terms) filter reaches the token stream
    before any aggregation, idf/stats ride broadcasts, and the top-10
    compiles to TakeOrderedAndProject — retrieval cost tracks the
    query's posting lists, not the corpus vocabulary."""
    df = q(spark, "q137_bm25_topk")
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # tf/dl are materialized once (localCheckpoint) — the final plan
    # reads the checkpointed RDDs, never re-scanning the corpus
    assert "Scan parquet" not in plan, plan


def test_pagerank_iterations_stay_keyed(spark):
    """q146: each power iteration is an equi-join + keyed agg; the
    final plan (last iteration feeds from checkpointed scores) must
    be cartesian-free with the top-20 as TakeOrderedAndProject, and
    the broadcast 1-row node count must not become a nested loop."""
    df = q(spark, "q146_pagerank")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_weighted_sample_uses_group_limit(spark):
    """q147: the per-stratum A-ES top-k must push into
    WindowGroupLimit — one map-side key expression plus a bounded
    per-group selection, never a global sort of the corpus."""
    df = q(spark, "q147_weighted_sample")
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_weighted_quantiles_window_on_histogram(spark):
    """q155: the cumulative-weight window must consume the (group,
    value) WEIGHT HISTOGRAM (post-aggregation), never raw lineitem —
    Window above HashAggregate, exactly the q94/q114 discipline with
    weights instead of counts."""
    df = q(spark, "q155_weighted_quantiles")
    plan = formatted_plan(df)
    assert "Window" in plan, plan
    assert plan.index("Window") > plan.index("HashAggregate"), plan


def test_cdc_compaction_single_shuffle(spark):
    """q157: latest-wins election + version count share the user_id
    partitioning — ONE hash exchange reconstructs the snapshot (the
    LSM-compaction cost model); the only other exchange allowed is
    the final presentation sort's range partitioning."""
    df = q(spark, "q157_cdc_log_compaction")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert count_shuffles(df) <= 2, plan  # hash + presentation sort


def test_allocation_windows_on_dimension_table(spark):
    """q156: the remainder-ranking window runs over the materialized
    nation-count histogram (25 rows — customers are scanned ONCE, at
    the shared-intermediate checkpoint, never once per consumer) and
    the 1-row total/leftover ride broadcasts; no cartesian blowup
    (the 1-row broadcast cross joins are nested-loop by name but
    1×N by construction)."""
    df = q(spark, "q156_largest_remainder_alloc")
    plan = formatted_plan(df)
    assert "Window" in plan, plan
    assert plan.count("customer.parquet") == 0, plan  # pre-materialized
    assert "CartesianProduct" not in plan, plan


def test_khop_frontier_stays_keyed(spark):
    """q154: the final hop's plan (frontiers feed from checkpointed
    state) must stay equi-join + anti-join — no cartesian, no
    nested-loop fallback."""
    df = q(spark, "q154_khop_reachability")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_lorenz_windows_on_bucket_histogram(spark):
    """q161: the cumulative Lorenz windows run over the $100k revenue
    bucket grid (value-bounded), never per-customer rows — Window is
    the PARENT of the bucket aggregate (formatted plans print parents
    first), and the orders scan reads only the two needed columns."""
    df = q(spark, "q161_revenue_lorenz")
    plan = formatted_plan(df)
    assert "Window" in plan, plan
    assert plan.index("Window") < plan.index("HashAggregate"), plan
    cols = set(read_schema_columns(df))
    assert cols == {"o_custkey", "o_totalprice"}, cols


def test_chisq_windows_on_cell_table(spark):
    """q162: the cell aggregate localCheckpoints (r x c rows, three
    consumers — the fact join is scanned once, never re-derived), so
    the final plan's windows and grid-completion joins consume only
    the checkpointed RDD: no parquet scan, no cartesian (the grid
    cross is a 1xN broadcast)."""
    df = q(spark, "q162_chisq_independence")
    plan = formatted_plan(df)
    assert "Window" in plan, plan
    assert "Scan ExistingRDD" in plan, plan  # checkpointed cell table
    assert "parquet" not in plan, plan  # fact join paid once, upstream
    assert "CartesianProduct" not in plan, plan


def test_cusum_window_on_daily_grain(spark):
    """q163: the ordered cumulative runs over the calendar-bounded
    day-grain aggregate (Window is the parent of the day aggregate —
    formatted plans print parents first); the orders scan prunes to
    (o_orderdate, o_totalprice)."""
    df = q(spark, "q163_cusum_changepoint")
    plan = formatted_plan(df)
    assert plan.index("Window") < plan.index("HashAggregate"), plan
    cols = set(read_schema_columns(df))
    assert cols == {"o_orderdate", "o_totalprice"}, cols


def test_calibration_scores_jvm_side_single_shuffle(spark):
    """q164: scoring reuses q129's shared exploded-codegen pass and
    feeds ONE 10-ary-key aggregate on top of the per-doc scoring
    exchange — two hash exchanges total plus the presentation sort,
    no Python eval nodes, no joins."""
    df = q(spark, "q164_calibration_bins")
    plan = formatted_plan(df)
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("Arguments: hashpartitioning") == 2, plan


def test_int8_quantization_no_python_no_cartesian(spark):
    """q165: scale is computed array-locally (codegen transform +
    array_max), errors explode straight into a map-side-combinable
    label aggregate — no Python, no cartesian; the 5-row label join
    stays an equi-join."""
    df = q(spark, "q165_int8_quantization")
    plan = formatted_plan(df)
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan, plan
    assert "Generate" in plan, plan  # the explode pass
    assert "CartesianProduct" not in plan, plan


def test_ks_cumulative_on_collapsed_domain(spark):
    """q166: the ECDF cumulative runs over the $10-grid histogram
    (value-bounded domain — Window above the grid HashAggregate), and
    the max-D scalar rides a 1-row broadcast back — the only
    nested-loop join allowed is that 1xN broadcast."""
    df = q(spark, "q166_ks_two_sample")
    plan = formatted_plan(df)
    assert plan.index("Window") > plan.index("HashAggregate"), plan
    assert "CartesianProduct" not in plan, plan


def test_zipf_top500_is_take_ordered(spark):
    """q167: the top-500 vocabulary cut compiles to
    TakeOrderedAndProject (per-partition heap + single merge), never a
    global rangepartitioning sort of the vocab; the regression itself
    is one scalar aggregate."""
    df = q(spark, "q167_zipf_slope")
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_interval_union_windows_keyed_by_user(spark):
    """q168: both island windows and the island groupBy partition on
    user_id — one hashpartitioning exchange feeds all three (Catalyst
    reuses the partitioning), plus the presentation sort; no Python,
    no join."""
    df = q(spark, "q168_interval_union")
    plan = formatted_plan(df)
    assert "Join" not in plan, plan
    assert "PythonUDF" not in plan, plan
    assert plan.count("Arguments: hashpartitioning(user_id") == 1, plan


def test_fk_orphan_audit_joins_key_projections(spark):
    """q169: every relationship's dim side is a key-only projection
    (one column reaches each dim scan) and the catalog's broadcast
    dims broadcast; no cartesian anywhere in the 7-way union."""
    df = q(spark, "q169_fk_orphan_audit")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert count_broadcast_joins(df) >= 3, plan  # nation x2, region, supplier


def test_duplication_fraction_single_scan_digest_window(spark):
    """q170: the doc-frequency association is a count window on the
    digest key, so the corpus scans ONCE (a groupBy+join-back would
    recompute the whole distinct subtree as the join's build side)
    and only digests + doc ids shuffle."""
    df = q(spark, "q170_duplication_fraction")
    plan = formatted_plan(df)
    assert "PythonUDF" not in plan, plan
    assert count_scans(df) == 1, plan
    # distinct + window-on-h + per-doc agg + presentation sort
    assert count_shuffles(df) <= 4, plan
    assert "Join" not in plan, plan


def test_token_pmi_marginals_broadcast(spark):
    """q171: bigrams generate array-locally (no self-join); the vocab
    marginal broadcasts ONCE and both joins reuse the exchange; the
    corpus totals fold into a single 1-row broadcast from one pruned
    scan — three corpus scans total, top-100 via per-partition heap."""
    df = q(spark, "q171_token_pmi")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert count_broadcast_joins(df) >= 2, plan
    assert count_scans(df) <= 4, plan  # bcnt + 2 marginals + totals
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan
    # the duplicate marginal build dedupes at stage materialization
    assert "ReusedExchange" in executed_formatted_plan(df)


def test_association_rules_no_item_self_join(spark):
    """q172: the pair stream reuses q128's basket-local generation —
    the ONLY joins in the plan are broadcasts (item marginals +
    basket total against the already-aggregated rule table). The
    final plan starts from the localCheckpointed basket table (one
    materialization feeds pairs + marginals + total), so the cap's
    WindowGroupLimit is asserted on the basket subtree itself."""
    from big_data_spark.catalog import load_table
    from big_data_spark.queries import _capped_baskets

    li = load_table(spark, SF_ORACLE, "lineitem")
    bplan = formatted_plan(_capped_baskets(li, 64))
    assert "WindowGroupLimit" in bplan, bplan

    df = q(spark, "q172_association_rules")
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # every consumer reads the materialized basket table — the
    # lineitem parquet scan + cap window ran exactly once, inside
    # the checkpoint, so no parquet scan survives in the final plan
    assert "Scan parquet" not in plan, plan


def test_benford_grid_is_digit_sized(spark):
    """q173: one conditional-count groupBy collapses orders to <= 9
    rows before the grid join and the zero-fill window — the window's
    single-partition exchange carries the 9-row digit table, never
    the fact table (only the digit-count aggregate's exchange is
    hash-partitioned), and the fact side is one pruned pushed-filter
    scan."""
    df = q(spark, "q173_benford_audit")
    plan = formatted_plan(df)
    assert count_scans(df) == 1, plan
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    assert "Window" in plan and "PythonUDF" not in plan, plan


def test_oov_rate_vocab_take_ordered_and_broadcast(spark):
    """q174: the vocab cut compiles to TakeOrderedAndProject (never a
    global vocab sort) and membership is a broadcast join — the only
    hash exchanges are the vocab count and the per-source agg."""
    df = q(spark, "q174_oov_rate")
    plan = formatted_plan(df)
    # the vocab cut is a heap-based TakeOrdered; the only range
    # partitioning allowed is the source-sized presentation sort
    assert "TakeOrderedAndProject" in plan, plan
    assert count_broadcast_joins(df) >= 1, plan


def test_bigram_logprob_marginals_broadcast_no_cartesian(spark):
    """q175: bigrams generate array-locally; the unigram marginals
    broadcast; the bigram-model join is the only potentially-shuffled
    join and it is an equi-join on the pair key — no cartesian, no
    nested-loop except the 1-row totals cross."""
    df = q(spark, "q175_bigram_logprob")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert count_broadcast_joins(df) >= 2, plan


def test_langid_confusion_grid_windows_on_cells(spark):
    """q176: one scoring pass feeds one cell-table groupBy; the grid
    completion joins distinct-value frames (broadcast) and the
    row-share window partitions the bounded cell table — no Python,
    no cartesian blow-up beyond the langs x preds grid cross."""
    df = q(spark, "q176_langid_confusion")
    plan = formatted_plan(df)
    assert "PythonUDF" not in plan, plan
    assert "Window" in plan, plan


def test_token_entropy_windows_on_vocab_histogram(spark):
    """q177: the corpus collapses to (source, token) counts before
    any window — the per-source total/vocab windows and the entropy
    reduce all run over the histogram, and the window appears above
    the aggregate's exchange."""
    df = q(spark, "q177_token_entropy")
    plan = formatted_plan(df)
    assert "PythonUDF" not in plan, plan
    assert "Window" in plan, plan
    assert count_scans(df) == 1, plan


def test_centroid_shift_single_scan_no_self_join(spark):
    """q178: both half-means come from ONE conditional aggregation —
    no self-join of the exploded frame, so the embeddings table scans
    once and the only exchanges are the (label, dim) agg, the label
    reduce, and the presentation sort."""
    df = q(spark, "q178_centroid_shift")
    plan = formatted_plan(df)
    assert "Join" not in plan, plan
    assert count_scans(df) == 1, plan
    assert count_shuffles(df) <= 3, plan


def test_source_kl_single_scan_from_checkpointed_histogram(spark):
    """q179: the (source, token) histogram materializes once
    (localCheckpoint) and feeds all three consumers — corpus
    marginal, per-source totals, and the term join — so no parquet
    scan survives in the final plan and both joins broadcast."""
    df = q(spark, "q179_source_kl")
    plan = formatted_plan(df)
    assert "Scan parquet" not in plan, plan
    assert count_broadcast_joins(df) >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_approx_groupby_single_pass(spark):
    """q180: the estimate and its exact audit share ONE scan and ONE
    conditional-aggregation groupBy (plus the customer dim broadcast
    and the presentation sort) — never a second fact pass for the
    truth column."""
    df = q(spark, "q180_approx_groupby_ci")
    plan = formatted_plan(df)
    assert count_scans(df) == 2, plan  # orders + customer dim
    assert count_broadcast_joins(df) >= 1, plan
    assert plan.count("Arguments: hashpartitioning") == 1, plan


def test_burn_rate_window_on_hour_histogram(spark):
    """q181: events collapse to the hour histogram before the
    trailing RANGE window — the window appears above the aggregate's
    exchange, the frame keys on the integer hour index (missing hours
    can't widen a row frame), and no Python anywhere."""
    df = q(spark, "q181_burn_rate_alerts")
    plan = formatted_plan(df)
    assert "PythonUDF" not in plan, plan
    assert "Window" in plan, plan
    assert count_scans(df) == 1, plan


def test_lsh_eval_counts_over_checkpointed_pair_sets(spark):
    """q182: truth and candidate pair sets materialize once
    (localCheckpoint) and feed both their count and the hit join —
    the final plan reads no parquet and the three counts combine via
    1-row broadcasts."""
    df = q(spark, "q182_lsh_eval")
    plan = formatted_plan(df)
    assert "Scan parquet" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dedup_impact_slim_rows_two_shuffles(spark):
    """q183: the fingerprint winner window runs on slim rows (id,
    source, token count — never bodies) and the whole readout is one
    scan + the fp window exchange + the source agg + the
    presentation sort."""
    df = q(spark, "q183_dedup_impact")
    plan = formatted_plan(df)
    assert count_scans(df) == 1, plan
    assert "Join" not in plan, plan
    assert count_shuffles(df) <= 3, plan


def test_residual_adc_no_cartesian_broadcast_sides(spark):
    """q184: every small side (centroids, codebook, query components,
    per-cell LUT) joins as a BROADCAST — the corpus-sized component
    table is never shuffled against itself — and no stage degenerates
    to a cartesian product."""
    df = q(spark, "q184_residual_adc_topk")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert count_broadcast_joins(df) >= 4, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_ivfpq_pruned_refine_shortlist_broadcast(spark):
    """q185: the probe filter and the 20-row ADC shortlist both ride
    broadcast joins (the refine never shuffles the corpus), and the
    final exact re-rank is a TakeOrderedAndProject."""
    df = q(spark, "q185_ivfpq_pruned_refine")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert count_broadcast_joins(df) >= 5, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_kmeans_invariants_single_agg(spark):
    """q186: the post-fit readout is one global aggregate over the
    assigned frame — no join, no window."""
    df = q(spark, "q186_kmeans_fit_invariants")
    plan = formatted_plan(df)
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_w2v_vocab_invariants_single_agg(spark):
    """q187: the vocabulary readout aggregates the trained model's
    vectors table once — no join back to the corpus."""
    df = q(spark, "q187_w2v_vocab_invariants")
    plan = formatted_plan(df)
    assert "Join" not in plan, plan
    assert "Scan parquet" not in plan, plan


def test_bpe_round_single_exchange_no_python(spark):
    """q188/q189's trainer (operators/tokenizer.py): the per-round
    pair count is ONE map-side-combinable exchange over the
    vocab-sized state — no join, no Python, no higher-order lambdas
    (slice/arrays_zip/explode stay in codegen) — and the merge
    application / encoder is a map-only replace projection adding
    ZERO exchanges. The 100-TB argument checked as code: after the
    one corpus-scale word-table groupBy, every training round moves
    only vocab-local bytes."""
    from pyspark.sql import functions as F

    from big_data_spark.catalog import load_table
    from big_data_spark.operators.tokenizer import (
        BPEMerge,
        _pair_counts,
        _wrapped,
        apply_bpe,
        bpe_word_table,
    )

    words = bpe_word_table(
        load_table(spark, SF_ORACLE, "documents"), token_pattern="^[a-z]+$"
    )
    state = words.select(
        _wrapped("w").alias("_s"), F.col("cnt").alias("_cnt")
    )
    counts = _pair_counts(state)
    plan = formatted_plan(counts)
    # one exchange beyond the word table's own build agg
    assert count_shuffles(counts) == count_shuffles(words) + 1, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan

    enc = apply_bpe(words, [BPEMerge(1, "a", "b", "ab", 0)])
    assert count_shuffles(enc) == count_shuffles(words), formatted_plan(enc)


def test_unigram_seed_one_exchange_encode_map_only(spark):
    """q190/q191's trainer (operators/unigram.py): the seed-vocab
    candidate count is ONE map-side-combinable exchange (plus the
    per-length-class rank's) over the vocab-sized word table — nested
    explode(sequence) substring generation stays in codegen, no join,
    no Python. The Viterbi encoder is ONE Arrow-batched map-only
    stage: zero additional exchanges, so at 100 TB encoding never
    shuffles the corpus."""
    from big_data_spark.catalog import load_table
    from big_data_spark.operators.tokenizer import bpe_word_table
    from big_data_spark.operators.unigram import (
        UnigramPiece,
        apply_unigram,
        unigram_seed_vocab,
    )

    words = bpe_word_table(
        load_table(spark, SF_ORACLE, "documents"), token_pattern="^[a-z]+$"
    )
    seed = unigram_seed_vocab(words, seed_size=50, max_piece_len=6)
    plan = formatted_plan(seed)
    # the substring agg + the two-level rank (per-bucket pre-truncate,
    # then the class rank over the bounded shortlist — ADVICE r09),
    # beyond the word table's own build agg
    assert count_shuffles(seed) == count_shuffles(words) + 3, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan, plan

    enc = apply_unigram(
        words, [UnigramPiece(c, -1.0, 1) for c in "abcdefghijklmnopqrstuvwxyz"]
    )
    eplan = formatted_plan(enc)
    assert count_shuffles(enc) == count_shuffles(words), eplan
    assert "Join" not in eplan, eplan


def test_encode_corpus_broadcast_lut_no_cartesian(spark):
    """q192's corpus encode (operators/tokenizer.py encode_corpus):
    the vocab-sized LUT joins BROADCAST (never a corpus shuffle for
    the join), no cartesian product, and the only exchanges beyond
    the inputs' own are the per-doc re-assembly groupBy and the
    zero-token-preserving join back to docs."""
    from big_data_spark.catalog import load_table
    from big_data_spark.operators.tokenizer import (
        BPEMerge,
        apply_bpe,
        bpe_word_table,
        encode_corpus,
    )

    docs = load_table(spark, SF_ORACLE, "documents")
    words = bpe_word_table(docs, token_pattern="^[a-z]+$")
    lut = apply_bpe(words, [BPEMerge(1, "a", "b", "ab", 0)])
    out = encode_corpus(docs, lut, token_pattern="^[a-z]+$")
    plan = formatted_plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_longest_match_encode_map_only(spark):
    """q194's trie encoder (encode_longest_match): ONE Arrow-batched
    map-only stage over the word table — zero exchanges, zero joins
    beyond the table's own build, independent of merge-table size
    (apply_bpe's per-96-merge checkpoints are gone). At 100 TB the
    encode never shuffles anything."""
    from big_data_spark.catalog import load_table
    from big_data_spark.operators.tokenizer import (
        bpe_word_table,
        encode_longest_match,
    )

    docs = load_table(spark, SF_ORACLE, "documents")
    words = bpe_word_table(docs, token_pattern="^[a-z]+$")
    enc = encode_longest_match(words, list("abcdefghijklmnopqrstuvwxyz"))
    plan = formatted_plan(enc)
    assert count_shuffles(enc) == count_shuffles(words), plan
    assert "Join" not in plan, plan


def test_byte_fallback_join_path_stays_jvm_side(spark):
    """q195's byte fallback: the <0xNN> synthesis in the join strategy
    is a pure column expression (hex/encode/transform) — no Python
    stage anywhere in the plan, broadcast LUT join preserved."""
    from big_data_spark.catalog import load_table
    from big_data_spark.operators.tokenizer import (
        BPEMerge,
        apply_bpe,
        bpe_word_table,
        encode_corpus,
    )

    docs = load_table(spark, SF_ORACLE, "documents")
    words = bpe_word_table(docs, token_pattern="^[a-z]{4,}$")
    lut = apply_bpe(words, [BPEMerge(1, "a", "b", "ab", 0)])
    out = encode_corpus(
        docs, lut, token_pattern="^[a-z]+$", oov_fallback="bytes"
    )
    plan = formatted_plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pack_sequences_shuffle_budget(spark):
    """q199 (pack_sequences): exactly the prescribed exchanges — the
    doc-grain per-source window, the token-grain (source, pack_id)
    re-assembly, and the presentation sort. The token-level stage must
    be hash-partitioned (scales with executors), never a single-
    partition sort, and nothing may explode tokens before the window
    (the window reads doc-grain rows only)."""
    df = q(spark, "q199_packed_sequences")
    plan = formatted_plan(df)
    # window (hash on source) + the EXPLICIT pack repartition (hash on
    # source, pack_id — without it Catalyst elides the exchange via
    # subset-key clustering and re-assembly parallelism collapses to
    # #sources; see the pack_sequences comment)
    assert plan.count("hashpartitioning(") == 2, plan
    assert count_shuffles(df) <= 3, plan  # + presentation rangepartitioning
    # one of the hash exchanges must key on pack_id (pack-grain
    # parallelism), not just source
    assert any(
        "hashpartitioning(" in line and "pack_id" in line
        for line in plan.splitlines()
    ), plan
    assert "CartesianProduct" not in plan, plan
    assert "Generate" in plan and "Window" in plan, plan


def test_q200_id_encode_keeps_broadcast_lut_plan(spark):
    """q200 (emit_ids): minting int ids must not change the encode
    plan — the vocab-sized LUT still broadcasts onto the exploded
    corpus (BroadcastHashJoin, no cartesian), and the byte-fallback
    ids are JVM-side expressions (the one Arrow stage in the plan is
    the vocab-sized LUT id-mapping, applied BEFORE the broadcast —
    never a corpus-scale Python crossing)."""
    df = q(spark, "q200_token_id_encode")
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # exactly two Arrow-boundary NODES — the trie encode and the id
    # mapping, BOTH on the vocab-sized LUT feeding the
    # BroadcastExchange; the corpus side stays JVM-only (the
    # formatted plan mentions each node several times — count the
    # numbered node entries, not raw substrings)
    import re as _re

    assert len(_re.findall(r"\(\d+\) MapInPandas", plan)) == 2, plan
    assert "BroadcastExchange" in plan, plan


def test_epoch_shuffle_adds_no_exchange(spark):
    """epoch_shuffle is a pure projection: the order key + bucket are
    md5/conv expressions, so mounting it on a scan yields a plan with
    ZERO exchanges — the trainer-side global order never requires the
    engine to sort or shuffle anything."""
    from pyspark.sql import functions as F

    from big_data_spark.catalog import load_table
    from big_data_spark.operators.chunking import epoch_shuffle

    docs = load_table(spark, SF_ORACLE, "documents").select(
        "source", F.col("doc_id").alias("pack_id")
    )
    df = epoch_shuffle(docs, seed=3, n_buckets=64)
    plan = formatted_plan(df)
    assert count_shuffles(df) == 0, plan
    assert "Exchange" not in plan, plan
