"""Fuzzed cross-engine parity for the parsing chains.

The golden corpus covers every intended branch; this test feeds a
seeded random corpus (digit/unit/keyword fragments + unicode noise)
through BOTH the Spark chain and the DuckDB oracle and requires
identical results — catching semantic drift on inputs nobody
hand-picked (SURVEY §7 risk (a) at fuzz scale).
"""

from __future__ import annotations

import random

import duckdb

from big_data_spark.fixtures import values_clause
from big_data_spark.operators.job_etl import (
    EXPERIENCE_ORACLE_SQL,
    SALARY_ORACLE_SQL,
    parse_experience,
    parse_salary,
)

FRAGMENTS = [
    "10", "15", "120", "999", "1000", "25000000", "7,5", "12.5", "0",
    "triệu", "tr", "m", "trieu", "usd", "USD", "$", "vnd", "VND",
    "-", " - ", "+", "năm", "year", "years", "yoe", "kn",
    "từ", "from", "at least", "tối thiểu", "min", "trên", "lên đến",
    "không yêu cầu", "chưa có", "mới tốt nghiệp", "intern",
    "thoả thuận", "cạnh tranh", "lương", "/tháng", "kinh nghiệm",
    "", " ", "  ", "abc", "xyz", "%", "#", "(", ")", "😀", "đ", "ê",
]


def _fuzz_corpus(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(1, 6)
        s = " ".join(rng.choice(FRAGMENTS) for _ in range(k))
        if rng.random() < 0.3:
            s = s.upper() if rng.random() < 0.5 else s.title()
        out.append(s)
    return out


def _compare(spark, corpus, colname, spark_fn, oracle_template, out_cols):
    df = spark.createDataFrame([(s,) for s in corpus], [colname])
    srows = {
        r[colname]: tuple(r[c] for c in out_cols)
        for r in spark_fn(df).select(colname, *out_cols).collect()
    }
    con = duckdb.connect()
    try:
        sql = oracle_template.format(src=values_clause(corpus, colname))
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        drows = {}
        for row in res.fetchall():
            m = dict(zip(cols, row))
            drows[m[colname]] = tuple(m[c] for c in out_cols)
    finally:
        con.close()
    mismatches = [
        (s, srows[s], drows[s]) for s in srows if srows[s] != drows[s]
    ]
    assert not mismatches, f"{len(mismatches)} mismatches, first 5: {mismatches[:5]}"


def test_fuzz_salary_parity(spark):
    corpus = list(dict.fromkeys(_fuzz_corpus(seed=1337, n=400)))
    _compare(
        spark,
        corpus,
        "salary",
        parse_salary,
        SALARY_ORACLE_SQL,
        ["salary_min", "salary_max", "salary_avg"],
    )


def test_fuzz_experience_parity(spark):
    corpus = list(dict.fromkeys(_fuzz_corpus(seed=4242, n=400)))
    _compare(
        spark,
        corpus,
        "experience",
        parse_experience,
        EXPERIENCE_ORACLE_SQL,
        ["exp_min_year", "exp_max_year", "exp_avg_year", "exp_type"],
    )
