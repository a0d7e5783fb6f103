"""Golden-file tests for the Vietnamese salary/experience parsing —
the riskiest behavior-compat surface (SURVEY.md §5, §7 risk (a)).

Expected values are hand-derived from the reference semantics
(job_streaming.py:70-147), not computed by the code under test.
"""

from __future__ import annotations

import pytest

from big_data_spark.fixtures import synthetic_postings
from big_data_spark.operators.job_etl import (
    clean_job_postings,
    parse_experience,
    parse_salary,
)

# (salary string, expected min, expected max, expected avg) in triệu VND
SALARY_GOLDEN = [
    ("10 - 15 triệu", 10.0, 15.0, 12.5),
    ("15tr", 15.0, None, 15.0),
    ("8m", 8.0, None, 8.0),
    # no 'triệu|tr|m' hint: separators stripped, >=1000 -> /1e6
    ("10.000.000 - 15.000.000", 10.0, 15.0, 12.5),
    # usd hint wins over magnitude: *25/1000
    ("500 - 900 USD", 12.5, 22.5, 17.5),
    ("$1,000", 25.0, None, 25.0),
    ("Thoả thuận", None, None, 0.0),
    # bare 100<x<1000 -> assumed thousands -> /1000
    ("120", 0.12, None, 0.12),
    # 'triệu' hint: comma kept -> cast('25,5') fails -> null
    ("25,5 triệu", None, None, 0.0),
    ("Từ 7 triệu", 7.0, None, 7.0),
    ("900", 0.9, None, 0.9),
    ("1000", 0.001, None, 0.001),  # >=1000 -> /1e6
    ("99", 99.0, None, 99.0),  # <=100 passes through
    ("300$", 7.5, None, 7.5),
    ("55 trieu", 55.0, None, 55.0),  # 'tr' substring hit
    ("15.5m", 15.5, None, 15.5),
]

# (experience string, exp_min, exp_max, exp_avg, exp_type)
EXPERIENCE_GOLDEN = [
    ("Không yêu cầu kinh nghiệm", None, None, 0.0, "no_requirement"),
    ("Chưa có kinh nghiệm", 0.0, None, 0.0, "no_experience"),
    ("Mới tốt nghiệp", 0.0, None, 0.0, "fresh_graduate"),
    ("intern", 0.0, None, 0.0, "unknown"),
    ("Từ 2 năm", 2.0, None, 2.0, "unknown"),
    ("from 3 years", 3.0, None, 3.0, "unknown"),
    ("tối thiểu 1 năm", 1.0, None, 1.0, "unknown"),
    ("3+", 3.0, None, 3.0, "unknown"),
    ("5 năm", 5.0, None, 5.0, "unknown"),
    ("2 yoe", 2.0, None, 2.0, "unknown"),
    ("1 - 3 năm", 1.0, 3.0, 1.0, "range"),
    ("2-4 years", 2.0, 4.0, 2.0, "range"),
    ("trên 4 năm", 4.0, None, 4.0, "lower_bound"),
    ("lên đến 10 năm", 10.0, None, 10.0, "upper_bound"),
    # >40 noise-filter nulls the average but keeps the min
    ("50 năm", 50.0, None, None, "unknown"),
    ("45+", 45.0, None, None, "unknown"),
    ("junior level", None, None, 0.0, "unknown"),
    ("", None, None, 0.0, "unknown"),
]


def test_salary_golden(spark):
    df = spark.createDataFrame([(s,) for s, *_ in SALARY_GOLDEN], ["salary"])
    rows = {
        r["salary"]: r
        for r in parse_salary(df).select(
            "salary", "salary_min", "salary_max", "salary_avg"
        ).collect()
    }
    for s, emin, emax, eavg in SALARY_GOLDEN:
        r = rows[s]
        assert r["salary_min"] == pytest.approx(emin), (s, r["salary_min"])
        assert r["salary_max"] == pytest.approx(emax), (s, r["salary_max"])
        assert r["salary_avg"] == pytest.approx(eavg), (s, r["salary_avg"])


def test_experience_golden(spark):
    df = spark.createDataFrame([(s,) for s, *_ in EXPERIENCE_GOLDEN], ["experience"])
    rows = {
        r["experience"]: r
        for r in parse_experience(df)
        .select("experience", "exp_min_year", "exp_max_year", "exp_avg_year", "exp_type")
        .collect()
    }
    for s, emin, emax, eavg, etype in EXPERIENCE_GOLDEN:
        r = rows[s]
        assert r["exp_min_year"] == pytest.approx(emin), (s, r["exp_min_year"])
        assert r["exp_max_year"] == pytest.approx(emax), (s, r["exp_max_year"])
        assert r["exp_avg_year"] == pytest.approx(eavg), (s, r["exp_avg_year"])
        assert r["exp_type"] == etype, (s, r["exp_type"])


def test_clean_job_postings_end_to_end(spark):
    raw = synthetic_postings(spark, 500)
    out = clean_job_postings(raw, deterministic_id=True)
    assert out.count() == 500  # no null titles in the generator
    cols = set(out.columns)
    for c in (
        "id",
        "salary_min",
        "salary_max",
        "salary_avg",
        "exp_min_year",
        "exp_max_year",
        "exp_avg_year",
        "exp_type",
        "city",
        "event_time",
    ):
        assert c in cols, c
    # temp columns must not leak
    assert not {"salary_clean", "raw_min", "val_min", "exp_raw", "exp_temp"} & cols
    # deterministic ids are stable across runs
    a = sorted(r["id"] for r in out.select("id").collect())
    b = sorted(r["id"] for r in clean_job_postings(raw, deterministic_id=True).select("id").collect())
    assert a == b
    assert len(set(a)) == 500
    # city default applied
    assert out.filter((out.city == "") | out.city.isNull()).count() == 0


def test_clean_filters_null_titles(spark):
    raw = spark.createDataFrame(
        [(None, "x", "10 triệu", "1 - 2 năm"), ("t", "Hà Nội", "5tr", "3+")],
        ["job_title", "city", "salary", "experience"],
    )
    assert clean_job_postings(raw, deterministic_id=True).count() == 1
