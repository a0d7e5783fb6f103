"""Skew-aware relational helpers.

The generic groupBy/join forms live directly in queries.py; this
module holds the explicitly skew-hardened variants you reach for when
one key carries a disproportionate share of a 100-TB table and AQE's
runtime skew-split isn't available (e.g. streaming state, or a
pre-AQE cluster).

Salting = two-phase aggregation: phase 1 groups on (key, salt) so a
hot key's rows spread over ``salt`` reducers; phase 2 merges the
per-salt partials. Results are exactly those of the unsalted groupBy
(tests + oracle check in q51).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    key: str,
    sum_col: str,
    salt: int = 16,
    sum_scale: int = 4,
) -> DataFrame:
    """Skew-proof groupBy(key).agg(count, decimal-exact sum).

    The salt column derives from a deterministic hash of arbitrary
    other columns' bytes via monotonically varying row content —
    here spark_partition_id + a cheap per-row counter is enough
    because the salt only needs to spread rows, not be stable.
    """
    salted = df.withColumn(
        "_salt", (F.monotonically_increasing_id() % salt).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_cnt"),
        F.sum(F.col(sum_col).cast(f"decimal(27,{sum_scale})")).alias("_sum"),
    )
    return partial.groupBy(key).agg(
        F.sum("_cnt").alias("cnt"),
        F.sum("_sum").cast("double").alias("total"),
    )


def broadcast_salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
) -> DataFrame:
    """Skewed-key equi-join: replicate the small side ``salt`` times
    with an explicit salt column, salt the big side's rows, join on
    (key, salt). Each hot-key bucket lands on a different reducer.

    Only needed when the small side is too big to broadcast outright
    AND the key is skewed; otherwise use F.broadcast(small) or let
    AQE's skewJoin handle it (both are on in session.py).
    """
    salts = small.sparkSession.range(salt).select(
        F.col("id").cast("int").alias("_salt")
    )
    small_rep = small.crossJoin(F.broadcast(salts))
    big_salted = big.withColumn(
        "_salt", (F.monotonically_increasing_id() % salt).cast("int")
    )
    return big_salted.join(small_rep, [key, "_salt"]).drop("_salt")


def clip_outliers(
    df: DataFrame,
    col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    relative_error: float = 0.25,
) -> DataFrame:
    """approxQuantile-based outlier clipping — A9 parity
    (ml_train_from_cassandra_pyspark.pyc:177 preprocess_data uses
    exactly (0.01, 0.99, 0.25)).

    approxQuantile (Greenwald-Khanna) runs in one pass with bounded
    memory — the only viable form at 100 TB; q37 is the exact-
    percentile twin used for oracle checking. Tighten
    ``relative_error`` to trade memory for accuracy.
    """
    lo_v, hi_v = df.approxQuantile(col, [lo, hi], relative_error)
    c = F.col(col)
    return df.withColumn(
        col, F.when(c < lo_v, lo_v).when(c > hi_v, hi_v).otherwise(c)
    )
