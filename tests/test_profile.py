"""Table profiling operator: exact path is oracle-checked via
q85_table_profile (tests/test_oracle_parity.py); here the approx
(HLL++) scale path and the plan shape."""

from __future__ import annotations

from big_data_spark.catalog import load_table
from big_data_spark.operators.profile import profile_table

from .conftest import SF_ORACLE


def test_approx_profile_close_to_exact(spark):
    orders = load_table(spark, SF_ORACLE, "orders")
    exact = {r["col_name"]: r for r in profile_table(orders).collect()}
    approx = {r["col_name"]: r for r in profile_table(orders, exact=False).collect()}
    assert exact.keys() == approx.keys()
    for col, e in exact.items():
        a = approx[col]
        # nulls and min/max are exact in both paths
        assert a["null_count"] == e["null_count"]
        assert a["min_s"] == e["min_s"] and a["max_s"] == e["max_s"]
        # HLL++ default rsd = 5%; allow 3 sigma
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(
            5, 0.15 * e["n_distinct"]
        ), (col, a["n_distinct"], e["n_distinct"])


def test_approx_profile_avoids_expand(spark):
    """The scale path must not pay the multi-count-distinct Expand:
    approx profiles plan as one regular aggregate."""
    orders = load_table(spark, SF_ORACLE, "orders")
    exact_plan = profile_table(orders)._jdf.queryExecution().executedPlan().toString()
    approx_plan = (
        profile_table(orders, exact=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in exact_plan  # the price of exactness
    assert "Expand" not in approx_plan
