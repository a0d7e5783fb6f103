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

    Timestamp physical types have varied across testdata generations:
    timestamp[ns] (Spark reads as long nanos under
    legacy.parquet.nanosAsLong) and timestamp[us] with
    isAdjustedToUTC=false (Spark reads as TIMESTAMP_NTZ). Normalize
    both to session-tz TimestampType here — the session runs UTC, so
    an NTZ→LTZ cast preserves wall-clock values and every downstream
    plan/schema is identical regardless of the file generation.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    dtypes = dict(df.dtypes)
    if name == "events" and dtypes.get("ts") == "bigint":
        # integer div, not /: float division of ~1e18 nanos loses the
        # low microsecond digits (double has 53 mantissa bits)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz_cols = [c for c, t in dtypes.items() if t == "timestamp_ntz"]
    if ntz_cols:
        df = df.withColumns(
            {c: F.col(c).cast("timestamp") for c in ntz_cols}
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
