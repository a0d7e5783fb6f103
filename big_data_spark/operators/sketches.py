"""Mergeable-sketch rollups: the pre-aggregation pattern for
interactive analytics over 100 TB.

Build tiny per-(day, key) sketch rows ONCE (HLL for distinct counts,
KLL for quantiles — Spark 4's built-in DataSketches functions, JVM
native); answer any later range query by MERGING sketches instead of
rescanning raw data. A year of daily sketches is ~KBs per key: the
difference between a dashboard query touching gigabytes and touching
the raw corpus. Sketches are associative, so daily → weekly → yearly
rollups compose losslessly (within the sketch's error bound, ~2% for
HLL at default lgConfigK).

Generalizes q85's one-shot approx profiling into a persisted,
incrementally-maintainable form (same spirit as the streaming rollup
sink in streaming/sinks.py — partials once, merge on read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_daily_sketches(events: DataFrame) -> DataFrame:
    """Per (day, event_type): HLL sketch of user_id (distinct users),
    KLL sketch of value (quantiles), and exact row count. One shuffle
    keyed by (day, type); output is dimension-sized."""
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
        )
        .agg(
            F.hll_sketch_agg("user_id").alias("users_hll"),
            F.kll_sketch_agg_double("value").alias("value_kll"),
            F.count("*").alias("n_events"),
        )
    )


def merge_range(daily: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Answer a range query from sketches alone: filter ``daily`` to
    the wanted days upstream, then merge per ``group_cols`` (default:
    one global row). Returns approx distinct users, exact event count,
    and approx value quantiles (p50/p95) — no raw-data rescan."""
    gb = daily.groupBy(*group_cols) if group_cols else daily.groupBy()
    # KLL has no union AGGREGATE (only the binary kll_sketch_merge);
    # fold the per-day sketches with a higher-order aggregate — the
    # list is range-bounded (<= days in the range), never data-sized
    # NB: SQL bracket subscripts are 0-BASED while slice() is 1-based:
    # init must be _klls[0] (first element) with the fold over
    # slice(..., 2, ...) (second..last) — _klls[1] would drop the
    # first sketch and NULL out single-sketch groups
    kll_fold = F.expr(
        "aggregate(slice(_klls, 2, size(_klls)), _klls[0],"
        " (acc, x) -> kll_sketch_merge_double(acc, x))"
    )
    merged = gb.agg(
        F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias(
            "approx_users"
        ),
        F.sum("n_events").cast("long").alias("n_events"),
        F.collect_list("value_kll").alias("_klls"),
    ).withColumn("_kll", kll_fold)
    return merged.select(
        *(group_cols or []),
        "approx_users",
        "n_events",
        F.kll_sketch_get_quantile_double(F.col("_kll"), F.lit(0.5)).alias(
            "value_p50"
        ),
        F.kll_sketch_get_quantile_double(F.col("_kll"), F.lit(0.95)).alias(
            "value_p95"
        ),
    )


def build_daily_freq_sketches(
    events: DataFrame,
    key_col: str = "event_type",
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Per-day Count-Min sketch of ``key_col`` frequencies — the
    heavy-hitter complement of the HLL/KLL rollups: answer "how often
    did key k occur in this range" from KB-sized mergeable partials
    with a one-sided error of at most eps x range_total."""
    return events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count_min_sketch(
            key_col, F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("freq_cms"),
        F.count("*").alias("n_events"),
    )


def cms_merge_and_estimate(spark, cms_blobs, keys) -> dict:
    """Merge serialized Count-Min sketches (driver-side, control
    plane: one KB-sized blob per day in the range) and estimate each
    key's frequency. Estimates are >= the true count and <= true +
    eps x total with the sketch's confidence."""
    jvm = spark.sparkContext._jvm
    merged = None
    for blob in cms_blobs:
        bis = jvm.java.io.ByteArrayInputStream(bytes(blob))
        cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
        if merged is None:
            merged = cms
        else:
            merged.mergeInPlace(cms)
    if merged is None:  # empty range: zero observations, zero counts
        return {k: 0 for k in keys}
    return {k: merged.estimateCount(k) for k in keys}
