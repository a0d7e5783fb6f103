"""Env-gated Delta Lake MERGE equivalence for scd2_apply.

The SCD-2 sink's docstring positions versioned-snapshot + manifest
repoint as the plain-parquet form of table-format MERGE semantics.
Where a delta-spark wheel exists, this test makes that claim
executable: the same update batch applied via Delta ``MERGE INTO``
(close-changed) + append (open-new) must produce exactly the
scd2_apply snapshot, including on a crash-window-shaped batch (one
changed key, one identical no-op key, one brand-new key).

Skips when `delta` is not importable — the sandbox has no delta-spark
wheel and no network to fetch the matching jars (pip/apt are frozen).
The plain-parquet semantics are pinned broker-/format-lessly in
tests/test_scd.py.
"""

from __future__ import annotations

import pytest

delta = pytest.importorskip(
    "delta",
    reason=(
        "MERGE equivalence needs the delta-spark wheel + matching jars "
        "(not installable in this sandbox); scd2_apply semantics are "
        "covered format-lessly in tests/test_scd.py"
    ),
)


@pytest.fixture(scope="module")
def delta_spark():
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("bds-delta-merge")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    spark = configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark
    spark.stop()


def test_merge_into_equals_scd2_apply(delta_spark, tmp_path):
    from delta.tables import DeltaTable
    from pyspark.sql import functions as F

    from big_data_spark.operators.scd import scd2_apply

    spark = delta_spark
    dim_rows = [
        # key, attr, valid_from, valid_to, is_current
        (1, "a", "2024-01-01 00:00:00", None, True),
        (2, "b", "2024-01-01 00:00:00", None, True),
        (2, "old", "2023-06-01 00:00:00", "2024-01-01 00:00:00", False),
    ]
    dim = spark.createDataFrame(
        dim_rows, ["k", "attr", "valid_from", "valid_to", "is_current"]
    ).select(
        "k",
        "attr",
        F.to_timestamp("valid_from").alias("valid_from"),
        F.to_timestamp("valid_to").alias("valid_to"),
        "is_current",
    )
    # crash-window-shaped batch: k=1 changes, k=2 identical (no-op),
    # k=3 brand new
    updates = spark.createDataFrame(
        [
            (1, "a2", "2024-02-01 00:00:00"),
            (2, "b", "2024-02-01 00:00:00"),
            (3, "c", "2024-02-01 00:00:00"),
        ],
        ["k", "attr", "ts"],
    ).withColumn("ts", F.to_timestamp("ts"))

    want = scd2_apply(dim, updates, key="k", tracked=["attr"]).collect()

    path = str(tmp_path / "dim_delta")
    dim.write.format("delta").save(path)
    tbl = DeltaTable.forPath(spark, path)
    # close changed current rows
    (
        tbl.alias("d")
        .merge(
            updates.alias("u"),
            "d.k = u.k AND d.is_current = true AND NOT (d.attr <=> u.attr)",
        )
        .whenMatchedUpdate(
            set={"valid_to": "u.ts", "is_current": "false"}
        )
        .execute()
    )
    # open new versions: changed keys + brand-new keys
    cur_attrs = (
        spark.read.format("delta")
        .load(path)
        .filter("is_current")
        .select("k", F.col("attr").alias("cur_attr"))
    )
    opens = (
        updates.join(cur_attrs, "k", "left")
        .filter(~F.col("attr").eqNullSafe(F.col("cur_attr")) | F.col("cur_attr").isNull())
        .select(
            "k",
            "attr",
            F.col("ts").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    opens.write.format("delta").mode("append").save(path)

    got = spark.read.format("delta").load(path).collect()
    key = lambda r: (r["k"], str(r["valid_from"]), str(r["valid_to"]))
    assert sorted(map(tuple, got), key=lambda t: str(t)) == sorted(
        map(tuple, want), key=lambda t: str(t)
    )
