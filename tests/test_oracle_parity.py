"""Every oracle-backed query must match DuckDB exactly.

This mirrors the driver's CORRECTNESS gate (row-count + schema-name +
order-insensitive values) so mismatches surface locally first. Values
are compared exactly after canonical stringification — the queries are
designed (decimal sums, identical per-row IEEE math, explicit rounds)
to be bit-identical across engines, so no tolerance is needed.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from big_data_spark.queries import QUERIES

from .conftest import SF_ORACLE

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone = 'UTC'")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr distinguishes every double; both engines hand back
        # Python floats via their native bridges.
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_ORACLE)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    con = _duck_con(SF_ORACLE)
    try:
        res = con.execute(spec.oracle)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    finally:
        con.close()

    assert sorted(scols) == sorted(dcols), (
        f"{name}: column names differ: spark={scols} duckdb={dcols}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row count differs: spark={len(srows)} duckdb={len(drows)}"
    )
    sset = _rowset(scols, srows)
    dset = _rowset(dcols, drows)
    if sset != dset:
        diff_s = [r for r in sset if r not in set(dset)][:5]
        diff_d = [r for r in dset if r not in set(sset)][:5]
        raise AssertionError(
            f"{name}: values differ.\n  spark-only: {diff_s}\n  duck-only:  {diff_d}"
        )
