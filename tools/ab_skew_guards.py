"""Within-run A/B of the two skew guards added in round 5, at sf0.1.

Round-5 cross-round bench deltas (q128 +57%, q141 +39% vs round 4)
coincided with new guard machinery — the q128/q141 64-item basket cap
and the optional degree-ordered triangle orientation — but cross-round
numbers on this multi-tenant box carry ~±25% noise, so the only
meaningful measurement is on-vs-off inside ONE session, interleaved.
This script produces that measurement; results are recorded in
SCALING.md ("Skew-guard cost A/B").

Usage: python tools/ab_skew_guards.py  (env: SPARK_GRAFT_SF_DIR, _CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from big_data_spark.catalog import load_table
from big_data_spark.operators.relational import triangle_count
from big_data_spark.queries import _copurchase_edges, _copurchase_pairs
from big_data_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3


def _q128(spark, cap):
    li = load_table(spark, SF_DIR, "lineitem")
    pairs = _copurchase_pairs(li, max_basket_items=cap)
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(50)
    )


def _q141(spark, degree_ordered):
    li = load_table(spark, SF_DIR, "lineitem")
    edges = _copurchase_edges(li)  # the exact q141/q154 edge recipe
    tri = triangle_count(edges, degree_ordered=degree_ordered)
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return n_edges.crossJoin(tri).select("n_edges", "n_triangles")


VARIANTS = {
    "q128_cap_on": lambda s: _q128(s, 64),
    "q128_cap_off": lambda s: _q128(s, None),
    "q141_plain": lambda s: _q141(s, False),
    "q141_degree_ordered": lambda s: _q141(s, True),
}


def main() -> None:
    spark = get_spark("ab_skew_guards")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: touch the input once so rep 1 isn't charged page-cache
    load_table(spark, SF_DIR, "lineitem").count()
    times: dict[str, list[float]] = {k: [] for k in VARIANTS}
    for rep in range(REPS):  # interleave variants within each rep
        for name, fn in VARIANTS.items():
            t0 = time.perf_counter()
            fn(spark).collect()
            times[name].append(round(time.perf_counter() - t0, 3))
    med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
    out = {
        "sf_dir": SF_DIR,
        "reps": REPS,
        "times": times,
        "median": med,
        "cap_cost_pct": round(
            100 * (med["q128_cap_on"] / med["q128_cap_off"] - 1), 1
        ),
        "orientation_cost_pct": round(
            100 * (med["q141_degree_ordered"] / med["q141_plain"] - 1), 1
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
