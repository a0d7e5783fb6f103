"""Multi-dimensional data layout: Z-order (Morton) clustering for
parquet writes.

Parquet data skipping works off per-row-group min/max stats; a sort
on one column makes THAT column's ranges tight and every other
column's ranges full-width. Interleaving the bits of two key columns
(Morton code) and range-partitioning + sorting on the interleaved
key keeps BOTH columns' per-file ranges narrow — the standard
lakehouse `ZORDER BY` layout, built here from pure column
expressions (no engine extension needed). Verified empirically in
tests/test_layout.py by reading the written files' footer stats with
pyarrow.

At 100 TB: layout is paid once at write; every later query filtering
on either key prunes most row groups. The Morton expression is
per-row bit math — map-side, fused into the write's sort stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    result bit 2i is bit i of ``a``, bit 2i+1 is bit i of ``b``.
    Values are clamped into [0, 2^bits) by masking (callers should
    pre-scale real domains onto the grid)."""
    mask = (1 << bits) - 1
    a = a.cast("long").bitwiseAND(F.lit(mask))
    b = b.cast("long").bitwiseAND(F.lit(mask))
    expr = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        expr = (
            expr
            + F.shiftleft(abit, 2 * i)
            + F.shiftleft(bbit, 2 * i + 1)
        )
    return expr


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Morton interleave of (col_a, col_b): range-partition on the
    z-value (one shuffle — the layout cost), sort within partitions,
    drop the helper column. Both columns' per-file min/max ranges
    come out narrow, so scans filtering on EITHER key skip most
    files/row groups."""
    z = df.withColumn("_z", morton_code(F.col(col_a), F.col(col_b), bits))
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
