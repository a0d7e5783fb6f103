"""weighted_mix semantics: exact copy counts per branch, determinism,
and the empty-sequence guard for weight 0."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_spark.operators.mixing import (
    BUCKETS,
    mix_bucket,
    stratified_split,
    weighted_mix,
)


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
    )


def _weights(spark, mapping):
    return spark.createDataFrame(
        list(mapping.items()), "source string, weight_bp int"
    )


def test_full_copies_exact(spark):
    # weight 20000 = exactly 2 copies of every doc, no hash involved
    out = weighted_mix(_docs(spark), _weights(spark, {"s0": 20000}))
    per_doc = out.groupBy("doc_id").count().collect()
    assert per_doc and all(r["count"] == 2 for r in per_doc)
    copy_ids = {r["copy_id"] for r in out.collect()}
    assert copy_ids == {1, 2}


def test_weight_zero_drops_source_entirely(spark):
    out = weighted_mix(_docs(spark), _weights(spark, {"s1": 0, "s2": 10000}))
    srcs = {r["source"] for r in out.select("source").distinct().collect()}
    assert srcs == {"s2"}


def test_fractional_weight_matches_bucket_predicate(spark):
    # weight 2500: kept docs are exactly those with bucket < 2500
    docs = _docs(spark)
    out = weighted_mix(docs, _weights(spark, {"s3": 2500}))
    kept = {r["doc_id"] for r in out.collect()}
    expected = {
        r["doc_id"]
        for r in docs.filter(F.col("source") == "s3")
        .withColumn("b", mix_bucket(F.col("source"), F.col("doc_id")))
        .filter(F.col("b") < 2500)
        .collect()
    }
    assert kept == expected and 0 < len(kept) < 50


def test_deterministic_across_runs(spark):
    w = _weights(spark, {"s0": 7500, "s1": 15000, "s2": 0, "s3": 25000})
    a = sorted(map(tuple, weighted_mix(_docs(spark), w).collect()))
    b = sorted(map(tuple, weighted_mix(_docs(spark), w).collect()))
    assert a == b and len(a) > 0


def test_expected_rate_roughly_holds(spark):
    # hash buckets are uniform-ish: 5000bp over 1000 docs ~ 500 +- 20%
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("s0").alias("source")
    )
    n = weighted_mix(docs, _weights(spark, {"s0": 5000})).count()
    assert 380 <= n <= 620, n


def test_bucket_range(spark):
    rows = (
        spark.range(500)
        .select(mix_bucket(F.lit("x"), F.col("id")).alias("b"))
        .agg(F.min("b"), F.max("b"))
        .collect()[0]
    )
    assert rows[0] >= 0 and rows[1] < BUCKETS


def _strata(spark, n=3000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("lang"), (F.col("id") % 3).cast("string")).alias("lang"),
    )


def test_stratified_split_partitions_every_row_once(spark):
    out = stratified_split(_strata(spark))
    assert out.count() == 3000
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"train", "valid", "test"}


def test_stratified_split_proportions_within_each_stratum(spark):
    # 80/10/10 holds per stratum (1000 rows each), not just globally
    counts = {
        (r["lang"], r["split"]): r["count"]
        for r in stratified_split(_strata(spark)).groupBy("lang", "split").count().collect()
    }
    for lang in ("lang0", "lang1", "lang2"):
        train = counts.get((lang, "train"), 0)
        assert 700 <= train <= 900, (lang, train)
        for s in ("valid", "test"):
            assert 50 <= counts.get((lang, s), 0) <= 160, (lang, s, counts)


def test_stratified_split_deterministic_and_key_only(spark):
    a = {
        (r["doc_id"], r["split"])
        for r in stratified_split(_strata(spark)).collect()
    }
    b = {
        (r["doc_id"], r["split"])
        for r in stratified_split(_strata(spark)).collect()
    }
    assert a == b


def test_stratified_split_rejects_bad_fractions(spark):
    import pytest

    with pytest.raises(ValueError):
        stratified_split(_strata(spark), splits=(("train", 9000), ("test", 500)))


def test_stratified_split_single_split_assigns_all(spark):
    out = stratified_split(_strata(spark, 100), splits=(("all", 10000),))
    assert out.count() == 100
    assert {r["split"] for r in out.select("split").distinct().collect()} == {"all"}


def test_stratified_split_null_stratum_splits_proportionally(spark):
    """NULL strata must hash via the sentinel and split ~80/10/10
    among themselves — not all funnel into the last split (which is
    what an unguarded concat_ws/|| divergence produces)."""
    df = _strata(spark, 2000).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, F.col("lang"))
    )  # half the rows have NULL lang
    out = stratified_split(df)
    counts = {
        r["split"]: r["count"]
        for r in out.filter(F.col("lang").isNull()).groupBy("split").count().collect()
    }
    assert sum(counts.values()) == 1000
    assert 700 <= counts.get("train", 0) <= 900, counts
    for s in ("valid", "test"):
        assert 40 <= counts.get(s, 0) <= 170, counts


def test_token_budget_mix_contracts(spark):
    """Budget >= corpus keeps everything; a tiny budget keeps roughly
    its share per source; assignment is deterministic across calls."""
    from big_data_spark.operators.mixing import token_budget_mix

    from pyspark.sql import functions as F

    rows = [
        (f"s{i % 4}", i, 100) for i in range(400)
    ]  # 4 sources x 100 docs x 100 tokens
    docs = spark.createDataFrame(
        rows, "source string, doc_id long, n_tokens long"
    )
    # budget covers the whole corpus -> take_frac clamps to 1
    assert token_budget_mix(docs, 1_000_000).count() == 400
    # tiny budget: each source targets 1000/4=250 tokens of its
    # 10000 -> frac 0.025; kept counts should be near 2.5 per source
    small = token_budget_mix(docs, 1_000)
    per = {
        r["source"]: r["n"]
        for r in small.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert set(per) <= {"s0", "s1", "s2", "s3"}
    assert 0 < sum(per.values()) <= 30
    # deterministic: identical output on re-run
    a = {(r["source"], r["doc_id"]) for r in small.collect()}
    b = {(r["source"], r["doc_id"]) for r in token_budget_mix(docs, 1_000).collect()}
    assert a == b


def test_token_budget_mix_null_source_rows_drop_consistently(spark):
    """NULL-source docs form their own totals group but the inner
    join back drops them (NULL != NULL) — the documented contract; a
    sentinel coalesce upstream opts them in."""
    from big_data_spark.operators.mixing import token_budget_mix

    rows = [("s0", 1, 100), (None, 2, 100), ("s0", 3, 100)]
    docs = spark.createDataFrame(
        rows, "source string, doc_id long, n_tokens long"
    )
    out = token_budget_mix(docs, 1_000_000)
    ids = {r["doc_id"] for r in out.collect()}
    assert 2 not in ids and ids <= {1, 3}

    # and the NULL group must NOT dilute real sources' budget: with 2
    # real sources of 10000 tokens each and budget 10000, each real
    # source's share is 5000 (frac 0.5) — if the NULL group counted
    # toward _ns the share would drop to ~3333
    import math

    rows2 = (
        [("a", i, 100) for i in range(100)]
        + [("b", 1000 + i, 100) for i in range(100)]
        + [(None, 9000 + i, 100) for i in range(50)]
    )
    docs2 = spark.createDataFrame(
        rows2, "source string, doc_id long, n_tokens long"
    )
    kept = token_budget_mix(docs2, 10_000).count()
    # frac=0.5 over 200 docs -> expect ~100 kept; frac=1/3 would give ~67.
    # hash buckets are uniform, so allow a generous band around 100
    assert 80 <= kept <= 120, kept


def test_split_fractions_unbiased(spark):
    """32-bit bucket regression: on 100k keys an 80/10/10 split must
    land within ±1pp of spec. The old 16-bit bucket had a systematic
    +1.7pp modulo bias on train (2^16 % 10000 != 0) and fails this."""
    from pyspark.sql import functions as F

    from big_data_spark.operators.mixing import stratified_split

    docs = spark.range(100_000).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    out = stratified_split(
        docs, stratum_col="source", key_col="doc_id",
        splits=[("train", 8000), ("valid", 1000), ("test", 1000)],
    )
    fracs = {
        r["split"]: r["n"] / 100_000
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert abs(fracs["train"] - 0.8) < 0.01, fracs
    assert abs(fracs["valid"] - 0.1) < 0.01, fracs
    assert abs(fracs["test"] - 0.1) < 0.01, fracs
