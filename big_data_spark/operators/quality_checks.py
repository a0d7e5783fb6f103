"""Declarative data-quality constraint suite (the Deequ pattern).

A check suite is a list of named aggregate observations, each with a
pass predicate. ``constraint_report`` evaluates EVERY check on a table
in ONE aggregation pass (the observations ride a single ``df.agg``,
map-side combined) and unpivots the 1-row result to a long
(constraint, observed, passed) report driver-free via an
array-of-structs explode — the same shape Deequ's VerificationResult
renders, produced by a plan that scans the table exactly once.

Referential-integrity checks need a second table, so they cannot ride
the single-pass agg; ``referential_integrity`` emits the same report
schema from one left join against the (distinct) parent keys — the
join keys on the FK, broadcastable when the parent key set is small.

Cross-engine determinism: observations are count ratios (exact IEEE
division of exact longs) or min/max casts — every ``observed`` is
bit-identical across engines; predicates evaluate on the ROUNDED
observation so the pass verdict can never straddle a last-ulp
difference.

Scale: the single agg pass is the profile-table cost (operators/
profile.py) without the count-distinct expand unless a uniqueness
check asks for it; at 100 TB, per-check cost is one aggregate buffer
per task. Verdict rows are constraint-count-sized — KBs — so the
report can gate a pipeline (crash on any ``passed = false``) without
a second scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named observation + pass predicate.

    ``observed`` is an aggregate expression evaluated over the table
    (cast to double); ``passes`` maps the rounded observation column
    to a boolean verdict.
    """

    name: str
    observed: Column
    passes: Callable[[Column], Column]


def completeness(col: str) -> Column:
    """Fraction of non-null values: count(col)/count(*)."""
    return F.count(F.col(col)).cast("double") / F.count(F.lit(1))


def uniqueness(col: str) -> Column:
    """Fraction of distinct values: count_distinct(col)/count(col).

    1.0 iff the column is a key (over its non-null values). Exact —
    costs the count-distinct expand; swap approx_count_distinct at
    100 TB where a bounded-error verdict suffices.
    """
    return F.count_distinct(F.col(col)).cast("double") / F.count(F.col(col))


def accepted_values(col: str, allowed: list[str]) -> Column:
    """Fraction of rows whose value is in the allowed set."""
    ok = F.when(F.col(col).isin(allowed), 1.0).otherwise(0.0)
    return F.sum(ok) / F.count(F.lit(1))


def in_range(col: str, lo: float, hi: float) -> Column:
    """Fraction of rows with lo <= value <= hi (NULL counts as out)."""
    ok = F.when(F.col(col).between(lo, hi), 1.0).otherwise(0.0)
    return F.sum(ok) / F.count(F.lit(1))


def constraint_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks in one aggregation pass.

    Returns (constraint string, observed double rounded to 6,
    passed boolean), one row per check.
    """
    wide = df.agg(
        *[
            F.round(c.observed.cast("double"), 6).alias(f"__obs_{i}")
            for i, c in enumerate(checks)
        ]
    )
    # fail closed: an observation that comes back NULL (empty input —
    # 0/0 ratios, min/max of no rows) must yield a CONCRETE false
    # verdict, never a NULL that `filter(passed = false)` consumers
    # and the streaming gate would silently mishandle
    structs = [
        F.struct(
            F.lit(c.name).alias("constraint"),
            F.col(f"__obs_{i}").alias("observed"),
            F.coalesce(
                c.passes(F.col(f"__obs_{i}")).cast("boolean"), F.lit(False)
            ).alias("passed"),
        )
        for i, c in enumerate(checks)
    ]
    return wide.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def referential_integrity(
    name: str,
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
) -> DataFrame:
    """Fraction of child rows whose FK resolves in the parent.

    One left join child→distinct(parent keys) then one agg; passes
    iff every FK resolves (observed == 1.0). NULL FKs count as
    unresolved — use a completeness check to separate the two.
    """
    keys = parent.select(F.col(pk).alias("__pk")).distinct()
    joined = child.select(F.col(fk).alias("__fk")).join(
        keys, F.col("__fk") == F.col("__pk"), "left"
    )
    obs = F.round(
        F.sum(F.when(F.col("__pk").isNotNull(), 1.0).otherwise(0.0))
        / F.count(F.lit(1)),
        6,
    )
    return joined.agg(obs.alias("observed")).select(
        F.lit(name).alias("constraint"),
        "observed",
        F.coalesce(
            (F.col("observed") == 1.0).cast("boolean"), F.lit(False)
        ).alias("passed"),
    )
