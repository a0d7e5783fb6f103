"""Batch readers/writers.

Scale conventions:
- readers take an explicit schema (contract-first, §1.3) — schema
  inference is a full extra pass over 100 TB;
- ``write_parquet`` supports partitionBy + compaction-friendly
  ``target_file_rows`` repartitioning: downstream scans prune on
  partition columns, and file counts stay bounded instead of
  one-file-per-task;
- ``write_csv_single`` reproduces the reference's coalesce(1) CSV
  export (S9 evidence: spark/app/output/job_data_csv/ single part
  file) — explicitly a small-result export, never a big-data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV source with explicit schema (S8; permissive mode keeps the
    reference's null-on-malformed semantics, §1.3)."""
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), mode="PERMISSIVE", **options)
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: StructType, **options: str
) -> DataFrame:
    """JSON-lines source with explicit schema (S2 batch form)."""
    return spark.read.schema(schema).options(**options).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_file_rows: int | None = None,
) -> None:
    """Parquet sink (S5 overwrite / S6 append).

    ``partition_by`` buys partition pruning for every downstream
    reader; ``target_file_rows`` caps rows per output file via
    ``spark.sql.files.maxRecordsPerFile`` so file sizes stay sane (the
    small-files problem is the #1 operational issue of high-frequency
    appends at scale). The conf-based cap is a per-write option on the
    writer — unlike a count()-based repartition it adds no extra
    evaluation of the input plan and no shuffle.
    """
    writer = df.write.mode(mode)
    if target_file_rows:
        writer = writer.option("maxRecordsPerFile", target_file_rows)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None, **options: str
) -> DataFrame:
    """ORC source — the other columnar interchange format warehouses
    hand us. Schema optional: ORC files self-describe, but passing one
    keeps the contract-first guarantee (and skips the footer pass)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink with the same partition-pruning conventions as
    write_parquet (zlib default codec; predicate pushdown works the
    same way on the read side)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def compact_parquet(
    spark: SparkSession, path: str, target_files: int
) -> int:
    """Rewrite a parquet directory into ``target_files`` files — the
    small-files compaction every high-frequency append sink needs
    (thousands of KB-files turn a 100 TB scan into a metadata storm
    and starve the scheduler).

    coalesce (not repartition): merging files needs no shuffle.
    The rewrite lands in a sibling temp dir first, then the directory
    swap is rename-based (old -> .bak, new -> live, drop .bak): a
    crash before the final rename leaves the original intact; the
    .bak survives a crash after it, so recovery is re-running the
    compaction. Returns the new file count."""
    import glob as _glob
    import os
    import shutil

    df = spark.read.parquet(path)
    tmp, bak = f"{path}__compact_tmp", f"{path}__compact_bak"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(bak, ignore_errors=True)
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return len(_glob.glob(f"{path}/part-*.parquet"))


def write_csv_single(df: DataFrame, path: str, header: bool = True) -> None:
    """Single-file CSV export (S9: coalesce(1) + header).

    Deliberately driver-adjacent: use only for bounded results
    (top-k, aggregates). Large tables go through write_parquet.
    """
    df.coalesce(1).write.mode("overwrite").option(
        "header", str(header).lower()
    ).csv(path)
