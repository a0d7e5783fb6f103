"""Slowly-changing-dimension (type 2) merge as a pure DataFrame op.

The reference overwrites dimension rows in place (Cassandra upserts —
history is lost); SCD-2 keeps every version with a validity interval,
which is what an analytics store needs for as-of joins and auditing.
The real-world sink for this pattern is a table format with MERGE
(Delta/Iceberg); this operator computes the post-merge snapshot
declaratively so any sink (overwrite parquet, foreachBatch) can land
it.

Scale shape: one hash-shuffle of the CURRENT slice and the updates on
the business key (history rows pass through untouched), per-key
dedup of the batch via a window, and null-safe column comparison —
no driver-side loops, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    ts_col: str = "ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Next SCD-2 snapshot of ``dim`` after applying ``updates``.

    ``dim`` rows carry (key, *tracked, valid_from, valid_to,
    is_current); ``updates`` carry (key, *tracked, ts). Per key, only
    the latest update in the batch applies. A current row whose
    tracked values differ (null-safe) from the update is closed at
    the update timestamp and a new current version opens; unseen keys
    insert; identical updates are no-ops. History rows pass through.

    Join-side presence is tracked with explicit marker columns, never
    inferred from data columns — a current row with a NULL valid_from
    or an update with a NULL ts is still *present* and merges
    normally.

    Contract (documented, not scanned-for — checking would cost a
    pass over the batch): ``ts`` should be non-null (a null-ts update
    wins the per-key dedup last and opens a version with a null
    valid_from) and at-or-after the key's current valid_from; a late
    out-of-order update yields a version with valid_to < valid_from,
    faithfully recording the out-of-order arrival. Streams needing
    that guarantee should watermark+sort upstream.
    """
    out_cols = [key, *tracked, from_col, to_col, current_col]

    hist = dim.filter(~F.col(current_col)).select(*out_cols)
    cur = dim.filter(F.col(current_col)).select(*out_cols).withColumn(
        "_in_dim", F.lit(True)
    )

    latest = Window.partitionBy(key).orderBy(F.desc(ts_col))
    upd = (
        updates.withColumn("_rn", F.row_number().over(latest))
        .filter(F.col("_rn") == 1)
        .select(key, *[F.col(c).alias(f"_u_{c}") for c in tracked], ts_col)
        .withColumn("_in_upd", F.lit(True))
    )

    joined = cur.join(upd, key, "full_outer")
    differs = F.lit(False)
    for c in tracked:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"_u_{c}"))
    has_cur = F.col("_in_dim").isNotNull()
    has_upd = F.col("_in_upd").isNotNull()

    # current rows that survive as-is: no update, or identical update
    unchanged = joined.filter(has_cur & (~has_upd | ~differs)).select(*out_cols)
    # current rows closed by a differing update
    closed = (
        joined.filter(has_cur & has_upd & differs)
        .select(
            key,
            *tracked,
            F.col(from_col),
            F.col(ts_col).alias(to_col),
            F.lit(False).alias(current_col),
        )
    )
    # new versions: differing update on an existing key, or a new key
    opened = (
        joined.filter(has_upd & (~has_cur | differs))
        .select(
            key,
            *[F.col(f"_u_{c}").alias(c) for c in tracked],
            F.col(ts_col).alias(from_col),
            F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
            F.lit(True).alias(current_col),
        )
    )
    return hist.unionByName(unchanged).unionByName(closed).unionByName(opened)
