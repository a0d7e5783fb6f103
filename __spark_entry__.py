"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``big_data_spark.queries`` — the registry is the
single source of truth pairing each implemented operator (SURVEY.md
§2) with its DuckDB oracle SQL.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from big_data_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Multiway broadcast star join + exact-decimal aggregation
    (TPC-H Q5 shape) — exercises sources, joins, and aggs in one plan.
    """
    return QUERIES["q05_nation_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted -> rows-only check)."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
