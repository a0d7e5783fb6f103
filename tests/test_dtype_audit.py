"""Every oracle pair must agree on output TYPES, not just values —
a strict schema comparison in the external gate must never flag an
int32/int64 or DECIMAL/DOUBLE skew between the engines."""

from __future__ import annotations

import duckdb
import pytest

from big_data_spark.queries import QUERIES

from .conftest import SF_ORACLE

# spark simpleString dtype -> acceptable DuckDB type renderings
TYPE_MAP = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "double": {"DOUBLE"},
    "string": {"VARCHAR"},
    "timestamp": {"TIMESTAMP"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
}


def test_all_oracle_dtypes_align(spark):
    con = duckdb.connect()
    try:
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings".split()
        ):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
            )
        mismatches = []
        for name, spec in sorted(QUERIES.items()):
            if spec.oracle is None:
                continue
            sd = dict(spec.fn(spark, SF_ORACLE).dtypes)
            rel = con.sql(spec.oracle)
            dd = dict(zip(rel.columns, [str(t) for t in rel.types]))
            for c, st in sd.items():
                if st.startswith(("array<", "map<", "struct<")):
                    # The external gate's pandas canonicalizer cannot
                    # sort nested values (unhashable) — serialize with
                    # array_join/to_json before returning.
                    mismatches.append(f"{name}.{c}: nested type {st} in oracle query")
                    continue
                allowed = TYPE_MAP.get(st)
                if allowed is None:
                    mismatches.append(f"{name}.{c}: unmapped spark type {st}")
                elif dd.get(c) not in allowed:
                    mismatches.append(
                        f"{name}.{c}: spark={st} duckdb={dd.get(c)}"
                    )
        assert not mismatches, "\n".join(mismatches)
    finally:
        con.close()
