"""Mergeable-sketch rollups: accuracy vs exact, associativity, and
parquet persistence of the sketch binaries."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from big_data_spark.catalog import load_table
from big_data_spark.operators.sketches import build_daily_sketches, merge_range

from .conftest import SF_ORACLE


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_ORACLE, "events").select(
        "ts", "event_type", "user_id", "value"
    )


def test_range_merge_tracks_exact_within_tolerance(spark, events):
    daily = build_daily_sketches(events).cache()
    try:
        # global range: one merged row vs exact recompute on raw data
        got = merge_range(daily).collect()[0]
        exact_users = events.select("user_id").distinct().count()
        exact_n = events.count()
        assert got["n_events"] == exact_n  # counts are exact
        assert abs(got["approx_users"] - exact_users) / exact_users < 0.05
        p50, p95 = events.approxQuantile("value", [0.5, 0.95], 0.001)
        assert abs(got["value_p50"] - p50) / max(p50, 1e-9) < 0.05
        assert abs(got["value_p95"] - p95) / max(p95, 1e-9) < 0.05

        # sub-range: only days 1-10, merged per event_type
        sub = daily.filter(F.dayofmonth("day") <= 10)
        per_type = {
            r["event_type"]: r
            for r in merge_range(sub, ["event_type"]).collect()
        }
        raw_sub = events.filter(F.dayofmonth(F.date_trunc("day", "ts")) <= 10)
        for r in (
            raw_sub.groupBy("event_type")
            .agg(
                F.count_distinct("user_id").alias("u"),
                F.count("*").alias("n"),
            )
            .collect()
        ):
            m = per_type[r["event_type"]]
            assert m["n_events"] == r["n"]
            assert abs(m["approx_users"] - r["u"]) / r["u"] < 0.08
    finally:
        daily.unpersist()


def test_sketches_survive_parquet_roundtrip_and_compose(spark, events, tmp_path):
    """Persist daily sketches, read back, merge — identical estimate
    to merging in-memory (binary sketch columns are stable), and a
    two-level rollup (daily → two halves → global) equals the direct
    global merge: associativity."""
    daily = build_daily_sketches(events)
    path = str(tmp_path / "daily_sketches")
    daily.write.mode("overwrite").parquet(path)
    reread = spark.read.parquet(path)

    direct = merge_range(daily).collect()[0]
    from_disk = merge_range(reread).collect()[0]
    assert from_disk["approx_users"] == direct["approx_users"]
    assert from_disk["n_events"] == direct["n_events"]

    # two-level: union the two halves' merged sketches via a second merge
    lo = reread.filter(F.dayofmonth("day") <= 15)
    hi = reread.filter(F.dayofmonth("day") > 15)
    def half_merge(df):
        return df.groupBy().agg(
            F.hll_union_agg("users_hll").alias("users_hll"),
            F.collect_list("value_kll").alias("_klls"),
            F.sum("n_events").cast("long").alias("n_events"),
        ).select(
            "users_hll",
            F.expr(
                "aggregate(slice(_klls, 2, size(_klls)), _klls[0],"
                " (acc, x) -> kll_sketch_merge_double(acc, x))"
            ).alias("value_kll"),
            "n_events",
        )

    halves = half_merge(lo).unionByName(half_merge(hi))
    two_level = merge_range(halves).collect()[0]
    assert two_level["approx_users"] == direct["approx_users"]
    assert two_level["n_events"] == direct["n_events"]


def test_single_sketch_range_has_quantiles(spark, events):
    """Regression: a range holding exactly ONE daily sketch per group
    must still produce quantiles (the fold init is the FIRST element;
    an off-by-one here NULLs single-sketch groups and silently drops
    the first sketch of every larger range)."""
    daily = build_daily_sketches(events)
    one_day = daily.filter(F.dayofmonth("day") == 1)
    rows = merge_range(one_day, ["event_type"]).collect()
    assert rows
    for r in rows:
        assert r["value_p50"] is not None and r["value_p95"] is not None


def test_count_min_range_frequencies(spark, events):
    """Per-day CMS partials merged over a range: estimates bound the
    exact counts from above by at most eps x range_total (one-sided
    CMS error), with day-level partials composing like the HLL/KLL
    rollups."""
    from big_data_spark.operators.sketches import (
        build_daily_freq_sketches,
        cms_merge_and_estimate,
    )

    daily = build_daily_freq_sketches(events, eps=0.001)
    sub = daily.filter(F.dayofmonth("day") <= 10)
    blobs = [r["freq_cms"] for r in sub.select("freq_cms").collect()]
    total = sum(r["n_events"] for r in sub.select("n_events").collect())

    raw_sub = events.filter(F.dayofmonth(F.date_trunc("day", "ts")) <= 10)
    exact = {
        r["event_type"]: r["count"]
        for r in raw_sub.groupBy("event_type").count().collect()
    }
    est = cms_merge_and_estimate(spark, blobs, list(exact))
    for k, true_n in exact.items():
        assert est[k] >= true_n, (k, est[k], true_n)
        assert est[k] <= true_n + 0.001 * total + 1, (k, est[k], true_n)
