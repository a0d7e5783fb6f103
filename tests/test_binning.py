"""equi_frequency_buckets invariants: total coverage, bucket range,
monotonicity in the value, tie cohesion, and near-equal sizes on
uniform data — the ntile-without-global-sort contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_spark.operators.relational import equi_frequency_buckets


def _skewed(spark, n=5000):
    # values 0..99 with a quadratic skew plus heavy ties at 7
    return spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, 7)
        .otherwise((F.col("id") * F.col("id")) % 100)
        .alias("v"),
    )


def test_every_row_bucketed_in_range(spark):
    out = equi_frequency_buckets(_skewed(spark), "v", n_buckets=10)
    assert out.count() == 5000
    mm = out.agg(F.min("bucket"), F.max("bucket")).collect()[0]
    assert mm[0] >= 0 and mm[1] <= 9


def test_bucket_monotone_in_value(spark):
    rows = (
        equi_frequency_buckets(_skewed(spark), "v", n_buckets=10)
        .select("v", "bucket")
        .distinct()
        .orderBy("v")
        .collect()
    )
    buckets = [r["bucket"] for r in rows]
    assert buckets == sorted(buckets)


def test_ties_share_a_bucket(spark):
    out = equi_frequency_buckets(_skewed(spark), "v", n_buckets=10)
    per_value = out.groupBy("v").agg(F.count_distinct("bucket").alias("nb"))
    assert per_value.filter(F.col("nb") > 1).count() == 0


def test_null_values_keep_their_rows_and_get_lowest_bucket(spark):
    """NULL values must not vanish (null-safe map join) and must land
    together in the lowest bucket (NULL sorts first ascending)."""
    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 != 0, F.col("id") % 100).alias("v"),
    )  # 100 NULL rows
    out = equi_frequency_buckets(df, "v", n_buckets=10)
    assert out.count() == 1000  # every row bucketed, none dropped
    null_buckets = {
        r["bucket"]
        for r in out.filter(F.col("v").isNull()).select("bucket").distinct().collect()
    }
    assert null_buckets == {0}
    # the 100 nulls are exactly one bucket's frequency share here, so
    # they fill bucket 0 and non-null values start at bucket 1 —
    # equal-frequency semantics treat NULL as the lowest value group
    non_null_min = (
        out.filter(F.col("v").isNotNull()).agg(F.min("bucket")).collect()[0][0]
    )
    assert non_null_min == 1


def test_near_equal_sizes_on_uniform_values(spark):
    uniform = spark.range(10_000).select((F.col("id") % 1000).alias("v"))
    sizes = [
        r["count"]
        for r in equi_frequency_buckets(uniform, "v", n_buckets=10)
        .groupBy("bucket")
        .count()
        .collect()
    ]
    assert len(sizes) == 10
    assert max(sizes) - min(sizes) <= 10  # value-granular boundaries
