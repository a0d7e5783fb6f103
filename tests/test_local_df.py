"""local_df must plan as LocalTableScan (no Python-worker slices)
and reproduce createDataFrame's values/schema exactly — it replaces
the pickled-RDD literal path in every hot operator (round-12
optimization; see OPTIMIZATION_r12.md "literal frames")."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from big_data_spark.sources.local import local_df


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


CASES = [
    # (rows, schema) — the shapes the converted call sites use
    ([(1, "xin chào", [0.5, 1.5]), (2, None, None)],
     "k long, s string, v array<float>"),
    ([(0, [0.1, 0.2]), (1, [0.3, 0.4])], "cell bigint, centroid array<double>"),
    ([(1, "a", "b", "ab", 7)],
     "merge_rank int, left_sym string, right_sym string, merged string, n long"),
    ([("piece", -1.5, 3)], "piece string, logp double, count long"),
    ([], "fp string"),
]


def test_local_df_matches_list_path(spark):
    for rows, schema in CASES:
        a = spark.createDataFrame(rows, schema)
        b = local_df(spark, rows, schema)
        assert a.schema == b.schema, (rows, schema)
        assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_local_df_plans_local_table_scan(spark):
    df = local_df(spark, [(1, "x")], "k long, s string")
    plan = _plan(df)
    assert "LocalTableScan" in plan or "LocalRelation" in plan, plan
    assert "ExistingRDD" not in plan, plan


def test_local_df_name_list_inference_matches(spark):
    rows = [(3, [1.0, 2.0]), (4, [5.0, 6.0])]
    a = spark.createDataFrame(rows, ["cell", "centroid"])
    b = local_df(spark, rows, ["cell", "centroid"])
    assert a.schema == b.schema
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_local_df_rejects_non_arrow_session(spark):
    """r13 contract pin (VERDICT r12 "what's wrong" #5): without the
    Arrow flag, local_df would silently degrade to the pickled-RDD
    `Scan ExistingRDD` path it exists to kill — it must fail loudly
    instead. The flag is a runtime SQL conf, so flip it in place."""
    import pytest

    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    try:
        with pytest.raises(ValueError, match="arrow"):
            local_df(spark, [(1,)], "k long")
    finally:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # restored: the helper works again
    assert local_df(spark, [(1,)], "k long").collect()[0][0] == 1


def test_converted_site_plans_local_table_scan(spark):
    """One real converted call site (merges_df — the BPE model
    artifact under every tokenizer query) must plan as
    LocalTableScan, not ExistingRDD (the r12 conversion's plan pin at
    the operator level, not just the helper level)."""
    from big_data_spark.operators.tokenizer import BPEMerge, merges_df

    df = merges_df(spark, [BPEMerge(1, "a", "b", "ab", 7)])
    plan = _plan(df)
    assert "LocalTableScan" in plan or "LocalRelation" in plan, plan
    assert "ExistingRDD" not in plan, plan
