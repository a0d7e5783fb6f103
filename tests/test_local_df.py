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
