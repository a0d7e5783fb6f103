"""Table profiling: per-column null counts, distinct counts, and
min/max — the data-quality summary every ingestion pipeline runs
before training (the engine-native, oracle-checkable analogue of
``df.summary()``).

Scale design: ONE aggregation pass over the table produces every
column's stats (Spark expands multi-``count_distinct`` internally —
the standard exact-profile cost); the wide 1-row result then unpivots
to long format driver-free via an array-of-structs explode. For
100 TB profiles where exact distinct counts are not worth the expand
shuffle, ``exact=False`` swaps in ``approx_count_distinct`` (HLL++,
single regular aggregate, no expand) — same output schema, bounded
relative error instead of exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _minmax_as_string(col: str, dtype: str):
    """min/max rendered engine-portably: doubles go through
    DECIMAL(18,2) so both engines print identical digits."""
    c = F.col(col)
    if dtype == "double":
        c = c.cast("decimal(18,2)")
    return (
        F.min(c).cast("string").alias(f"__min_{col}"),
        F.max(c).cast("string").alias(f"__max_{col}"),
    )


def profile_table(df: DataFrame, exact: bool = True) -> DataFrame:
    """Long-format profile: one row per column with null_count,
    n_distinct, min_s, max_s (min/max as strings so heterogeneous
    column types share a schema)."""
    dtypes = dict(df.dtypes)
    aggs = []
    for col in df.columns:
        aggs.append(
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(
                f"__null_{col}"
            )
        )
        nd = (
            F.count_distinct(F.col(col))
            if exact
            else F.approx_count_distinct(F.col(col))
        )
        aggs.append(nd.alias(f"__nd_{col}"))
        aggs.extend(_minmax_as_string(col, dtypes[col]))
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(col).alias("col_name"),
            F.col(f"__null_{col}").alias("null_count"),
            F.col(f"__nd_{col}").alias("n_distinct"),
            F.col(f"__min_{col}").alias("min_s"),
            F.col(f"__max_{col}").alias("max_s"),
        )
        for col in df.columns
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
