"""Bucketed tables: pre-shuffled storage -> shuffle-free joins.

The 100-TB strategy for repeated fact⋈fact joins on the same key:
bucket both tables by the join key at write time; Spark then plans a
SortMergeJoin with NO exchange on either side.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from big_data_spark.catalog import load_table
from big_data_spark.operators.relational import (
    broadcast_salted_join,
    salted_count_sum,
)
from big_data_spark.plans import count_shuffles

from .conftest import SF_SMOKE


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf — set in conftest's session
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        orders = load_table(spark, SF_SMOKE, "orders")
        customer = load_table(spark, SF_SMOKE, "customer")
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .saveAsTable("orders_b")
        )
        (
            customer.withColumnRenamed("c_custkey", "o_custkey")
            .write.mode("overwrite")
            .bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .saveAsTable("customer_b")
        )
        a = spark.table("orders_b")
        b = spark.table("customer_b")
        joined = a.join(b, "o_custkey")
        n_shuffles = count_shuffles(joined)
        assert n_shuffles == 0, f"bucketed join should not shuffle, got {n_shuffles}"
        # and it still returns the right answer
        plain = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert joined.count() == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_salted_agg_equals_plain(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    salted = {
        r["event_type"]: (r["cnt"], r["total"])
        for r in salted_count_sum(ev, "event_type", "value", salt=8).collect()
    }
    plain = {
        r["event_type"]: (r["cnt"], r["total"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(27,4)")).cast("double").alias("total"),
        )
        .collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark):
    o = load_table(spark, SF_SMOKE, "orders").select("o_custkey", "o_orderkey")
    c = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    salted = broadcast_salted_join(o, c, "o_custkey", salt=8)
    assert salted.count() == o.join(c, "o_custkey").count()
    one = salted.filter(F.col("o_orderkey") == 1).collect()
    assert len(one) == 1 and one[0]["c_mktsegment"] is not None


def test_clip_outliers_within_tolerance(spark):
    from big_data_spark.operators.relational import clip_outliers

    o = load_table(spark, SF_SMOKE, "orders")
    clipped = clip_outliers(o, "o_totalprice", relative_error=0.01)
    lo_e, hi_e = (
        o.selectExpr(
            "percentile(o_totalprice, 0.01) AS lo",
            "percentile(o_totalprice, 0.99) AS hi",
        ).first()
    )
    got = clipped.selectExpr(
        "min(o_totalprice) AS mn", "max(o_totalprice) AS mx"
    ).first()
    # approx bounds land within a few percentile ranks of exact
    n = o.count()
    lo_rank = o.filter(o.o_totalprice <= got["mn"]).count() / n
    hi_rank = o.filter(o.o_totalprice <= got["mx"]).count() / n
    assert lo_rank <= 0.05
    assert hi_rank >= 0.95
    assert clipped.count() == n  # clipping never drops rows


def test_dynamic_partition_overwrite(spark, tmp_path):
    from big_data_spark.fixtures import jobs_corpus_df
    from big_data_spark.sources import write_parquet
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df = jobs_corpus_df(spark).na.fill({"city": "Unknown"})
        out = str(tmp_path / "dyn")
        write_parquet(df, out, partition_by=["city"])
        before = spark.read.parquet(out)
        n_total = before.count()
        n_hcm = before.filter(F.col("city") == "HCM").count()
        # overwrite ONLY the HCM partition with a single replacement row
        repl = df.filter(F.col("city") == "HCM").limit(1)
        write_parquet(repl, out, mode="overwrite", partition_by=["city"])
        after = spark.read.parquet(out)
        assert after.filter(F.col("city") == "HCM").count() == 1
        # all other partitions untouched
        assert after.count() == n_total - n_hcm + 1
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")


def test_q65_bucketed_query_join_has_no_shuffle(spark):
    """The registry's bucketed-join query must plan the fact⋈dim join
    without an exchange on either side (the bucketed layout IS the
    shuffle, paid once at write time)."""
    from big_data_spark.plans import count_shuffles
    from big_data_spark.queries import QUERIES

    import hashlib
    import os
    import tempfile

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # q65's layout is per-sf_dir AND per-process (see its docstring)
    sfx = hashlib.md5(SF_SMOKE.encode()).hexdigest()[:8] + f"_{os.getpid()}"
    base = os.path.join(tempfile.gettempdir(), f"bds_bucketed_{sfx}")
    try:
        df = QUERIES["q65_bucketed_segment_orders"].fn(spark, SF_SMOKE)
        # the final groupBy aggregation may shuffle (5 segments);
        # the join itself must not — so total exchanges <= 1
        assert count_shuffles(df) <= 1, df.explain(True)
        first = {r["c_mktsegment"]: r for r in df.collect()}
        # re-invocation reuses the fixed per-sf_dir location instead of
        # writing a fresh temp dir (no orphaned-directory leak)
        mtimes = {
            n: os.path.getmtime(os.path.join(base, n))
            for n in os.listdir(base)
        }
        df2 = QUERIES["q65_bucketed_segment_orders"].fn(spark, SF_SMOKE)
        assert {r["c_mktsegment"]: r for r in df2.collect()} == first
        assert {
            n: os.path.getmtime(os.path.join(base, n))
            for n in os.listdir(base)
        } == mtimes, "second invocation rewrote the bucketed tables"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        for kind in ("orders", "customer"):
            spark.sql(f"DROP TABLE IF EXISTS bds_{kind}_b_{sfx}")


def test_approx_count_distinct_within_tolerance(spark):
    """HLL++ sketch (the 100-TB form of q26's exact COUNT DISTINCT):
    bounded-memory one-pass, rsd-bounded error vs the exact count."""
    o = load_table(spark, SF_SMOKE, "orders")
    row = o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        F.count_distinct("o_custkey").alias("exact"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_asof_join_equals_naive(spark):
    """Union-window as-of == the naive per-pair max-prior-ts join."""
    from big_data_spark.operators.relational import asof_join

    ev = load_table(spark, SF_SMOKE, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("cv"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    got = {
        (r["event_id"], r["right_ts"])
        for r in asof_join(
            purchases, clicks, key="user_id", ts="ts", right_cols=["cv"]
        ).collect()
    }
    p, c = purchases.alias("p"), clicks.alias("c")
    naive = (
        p.join(c, (F.col("p.user_id") == F.col("c.user_id")) & (F.col("c.ts") <= F.col("p.ts")))
        .groupBy("p.event_id")
        .agg(F.max("c.ts").alias("right_ts"))
    )
    want = {(r["event_id"], r["right_ts"]) for r in naive.collect()}
    assert got == want and got


def test_range_join_binned_equals_naive(spark):
    """Binned interval join == the plain range-predicate join, for
    interval lengths both below and at the bin size."""
    from big_data_spark.operators.relational import range_join_binned

    ev = load_table(spark, SF_SMOKE, "events")
    iv = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("iid"),
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("t1"),
    )
    pts = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("pid"), "ts"
    )
    naive = (
        pts.join(iv, (F.col("ts") >= F.col("t0")) & (F.col("ts") <= F.col("t1")))
        .select("pid", "iid")
    )
    want = {(r["pid"], r["iid"]) for r in naive.collect()}
    for bin_s in (600, 3600):
        got = {
            (r["pid"], r["iid"])
            for r in range_join_binned(
                pts, iv, ts="ts", start="t0", end="t1", bin_seconds=bin_s
            ).collect()
        }
        assert got == want, bin_s
    assert want


def test_asof_and_range_join_randomized_equivalence(spark):
    """Seeded random timelines (dense duplicates, clustered keys) —
    the scalable forms must match the naive forms on data far uglier
    than the fixture."""
    import numpy as np

    from big_data_spark.operators.relational import asof_join, range_join_binned

    rng = np.random.RandomState(42)
    for round_ in range(2):
        n = 400
        base = 1_700_000_000
        rows = [
            (
                int(i),
                int(rng.randint(0, 12)),  # few keys -> heavy per-key traffic
                base + int(rng.randint(0, 7200)),  # 2h span, many ties
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "rid long, k long, epoch long").withColumn(
            "ts", F.col("epoch").cast("timestamp")
        )
        left = df.filter(F.col("rid") % 2 == 0).select("rid", "k", "ts")
        # right side deduped per (k, ts) like real usage
        right = (
            df.filter(F.col("rid") % 2 == 1)
            .groupBy("k", "ts")
            .agg(F.max("rid").alias("rv"))
        )
        got = {
            (r["rid"], r["right_ts"])
            for r in asof_join(left, right, key="k", ts="ts", right_cols=["rv"]).collect()
        }
        l, rr = left.alias("l"), right.alias("r")
        naive = (
            l.join(rr, (F.col("l.k") == F.col("r.k")) & (F.col("r.ts") <= F.col("l.ts")))
            .groupBy("l.rid")
            .agg(F.max("r.ts").alias("right_ts"))
        )
        want = {(r["rid"], r["right_ts"]) for r in naive.collect()}
        assert got == want and got, round_

        iv = df.filter(F.col("rid") % 5 == 0).select(
            F.col("rid").alias("iid"),
            F.col("ts").alias("t0"),
            (F.col("ts") + F.expr("INTERVAL 13 MINUTES")).alias("t1"),
        )
        pts = df.filter(F.col("rid") % 5 != 0).select(F.col("rid").alias("pid"), "ts")
        want_rj = {
            (r["pid"], r["iid"])
            for r in pts.join(
                iv, (F.col("ts") >= F.col("t0")) & (F.col("ts") <= F.col("t1"))
            ).collect()
        }
        got_rj = {
            (r["pid"], r["iid"])
            for r in range_join_binned(
                pts, iv, ts="ts", start="t0", end="t1", bin_seconds=780
            ).collect()
        }
        assert got_rj == want_rj and got_rj, round_


def test_write_bucketed_helper_zero_exchange_join(spark, tmp_path):
    """Two tables persisted via write_bucketed on the same key join
    with zero exchanges — the helper produces the q65 layout."""
    from big_data_spark.operators.relational import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        orders = load_table(spark, SF_SMOKE, "orders")
        customer = load_table(spark, SF_SMOKE, "customer").withColumnRenamed(
            "c_custkey", "o_custkey"
        )
        ob = write_bucketed(
            orders, "wb_orders", str(tmp_path / "o"), "o_custkey"
        )
        cb = write_bucketed(
            customer, "wb_customer", str(tmp_path / "c"), "o_custkey"
        )
        joined = ob.join(cb, "o_custkey")
        assert count_shuffles(joined) == 0
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS wb_orders")
        spark.sql("DROP TABLE IF EXISTS wb_customer")
