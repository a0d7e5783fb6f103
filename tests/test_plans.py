"""Physical-plan shape assertions: the 100-TB guarantees
(pushdown, pruning, broadcast, bounded shuffles) checked as code.
"""

from __future__ import annotations

import pytest

from big_data_spark.plans import (
    count_broadcast_joins,
    count_shuffles,
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
    assert "Exchange rangepartitioning" not in plan


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
