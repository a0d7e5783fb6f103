"""Physical-plan introspection helpers.

Scale guarantees are plan properties, not vibes: a filter that
doesn't reach PushedFilters reads every row group at 100 TB; a dim
join that doesn't broadcast shuffles the fact table. These helpers
make those properties assertable in tests (tests/test_plans.py) so a
regression in plan shape fails CI, not the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if every fragment appears in a PushedFilters entry."""
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    blob = " ".join(pushed)
    return all(f in blob for f in fragments)


def read_schema_columns(df: DataFrame, scan_table_hint: str = "") -> list[str]:
    """Column names appearing in scan ReadSchema lines (pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for ln in plan.splitlines():
        if "ReadSchema" in ln and (not scan_table_hint or scan_table_hint in ln):
            inner = ln.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols += [c.split(":")[0].strip() for c in inner.split(",") if ":" in c]
    return cols


_NODE = re.compile(r"^\((\d+)\) (\w+)")


def _nodes(df: DataFrame) -> list[str]:
    """Operator names from the formatted plan's detail section
    (each physical node appears exactly once there)."""
    out = []
    for ln in formatted_plan(df).splitlines():
        m = _NODE.match(ln.strip())
        if m:
            out.append(m.group(2))
    return out


def count_broadcast_joins(df: DataFrame) -> int:
    return sum(1 for n in _nodes(df) if n == "BroadcastHashJoin")


def count_shuffles(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (BroadcastExchange excluded —
    broadcasting a dim is the thing we want instead of a shuffle)."""
    return sum(1 for n in _nodes(df) if n == "Exchange")


def count_scans(df: DataFrame) -> int:
    """File-source scans in the plan — catches accidental subtree
    recomputation (Spark recomputes a derived frame on BOTH sides of
    a self-join unless the association is expressed join-free)."""
    return sum(1 for n in _nodes(df) if n == "Scan")


def executed_formatted_plan(df: DataFrame) -> str:
    """Formatted plan AFTER one execution — AQE applies exchange
    reuse during stage materialization, so ReusedExchange nodes only
    appear in the post-run plan, never the static one. Test-sized
    inputs only (runs a collect)."""
    df.collect()
    return formatted_plan(df)


def has_wholestage_codegen(df: DataFrame) -> bool:
    """Formatted plans mark codegen stages with '[codegen id : N]'."""
    return "codegen id" in formatted_plan(df)
