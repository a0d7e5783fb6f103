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

# Frozen roster of every entry that has EVER carried a DuckDB oracle.
# Window rotation reorders the registry each round; this list makes it
# impossible for a rotation (or any other registry edit) to silently
# drop an entry's oracle — removing one is an explicit, reviewed edit
# HERE, not a side effect of reordering _DRIVER_WINDOW_ORDER.
EVER_ORACLE_BACKED = frozenset(
    n for n in QUERIES if n.startswith("q")  # m0x entries are rows-only ML
)


def test_window_rotation_preserves_oracle_coverage():
    lost = sorted(EVER_ORACLE_BACKED - set(ORACLE_QUERIES))
    assert not lost, (
        "registry entries lost their DuckDB oracle (window rotation must "
        f"never drop oracle coverage): {lost}"
    )


def test_round4_demotions_still_oracle_backed():
    """The 13 queries demoted below the driver window in round 4 keep
    value-level parity coverage here — demotion changes evidence tier
    (driver pass → local mirror), never coverage."""
    demoted = {
        "q19_event_windows", "q36_attractiveness_rule",
        "q37_price_outlier_clip", "q39_customer_order_lists",
        "q40_token_hot_score", "q41_doc_quality", "q42_lang_id",
        "q43_fingerprint_dedup", "q50_cube_type_size",
        "q54_winnowing_fingerprints", "q63_embedding_sign_buckets",
        "q70_shipping_priority", "q73_promo_revenue_share",
    }
    missing = sorted(demoted - set(ORACLE_QUERIES))
    assert not missing, f"demoted queries missing from ORACLE_QUERIES: {missing}"


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
