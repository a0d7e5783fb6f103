"""Table catalog over the driver-generated parquet testdata.

Mirrors the reference's source surface (SURVEY.md §2.1): the
reference reads whole Cassandra tables (train_gbt.py:23-26); our
engine reads columnar parquet so Catalyst gets predicate pushdown and
column pruning for free. ``load_table`` is the single entry point —
every query/operator takes DataFrames, never paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# (region/nation are bounded by geography; supplier is ~1/600 of
# lineitem in TPC-H-like data).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing physical quirks.

    events.ts is written as parquet timestamp[ns], which Spark reads
    as long nanos (session sets legacy.parquet.nanosAsLong); convert
    to a proper microsecond TimestampType here so downstream plans
    see a clean schema.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer div, not /: float division of ~1e18 nanos loses the
        # low microsecond digits (double has 53 mantissa bits)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
