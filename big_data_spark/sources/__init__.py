"""Source/sink surface (SURVEY §2.1).

The reference's I/O inventory maps to: Kafka stream (S1 — see
streaming/, config-only swap), JSON value parse (S2 — from_json),
Cassandra batch/stream read/write (S4-S6 — parquet tables here),
parquet model/vector persistence (S7 — native), CSV source/sink
(S8/S9). This module holds the batch readers/writers; everything
returns/accepts DataFrames so operators stay storage-agnostic.
"""

from .io import (
    compact_parquet,
    read_csv,
    read_json,
    read_orc,
    write_csv_single,
    write_orc,
    write_parquet,
)

__all__ = [
    "compact_parquet",
    "read_csv",
    "read_json",
    "read_orc",
    "write_csv_single",
    "write_orc",
    "write_parquet",
]
