"""Recommender flows (§3.4) over deterministic postings."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from big_data_spark.fixtures import synthetic_postings
from big_data_spark.operators.job_etl import clean_job_postings
from big_data_spark.operators.recommender import (
    analyze_skill_gap,
    career_path_recommendations,
    recommend_skills_for_job,
)


@pytest.fixture(scope="module")
def postings(spark):
    return clean_job_postings(
        synthetic_postings(spark, 2000), deterministic_id=True
    ).cache()


def test_recommend_skills_excludes_owned(postings):
    rec = recommend_skills_for_job(postings, "Engineer", ["Python", "SQL"], n=5)
    rows = rec.collect()
    assert 0 < len(rows) <= 5
    skills = [r["skill"] for r in rows]
    assert "python" not in skills and "sql" not in skills
    # frequencies are descending
    freqs = [r["frequency"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)


def test_skill_gap_readiness(postings):
    gap = analyze_skill_gap(postings, "Engineer", ["Python", "SQL"], n=10)
    assert gap["readiness"] == pytest.approx(2 / 10)
    assert "python" not in gap["missing_skills"]
    assert len(gap["missing_skills"]) == 8


def test_career_paths_match_threshold(postings):
    # every generated posting has python+sql+one extra skill ->
    # owning python+sql gives 2/3 match everywhere
    paths = career_path_recommendations(postings, ["Python", "SQL"], n=5)
    rows = paths.collect()
    assert 0 < len(rows) <= 5
    for r in rows:
        assert r["avg_match"] > 0.3
        assert r["openings"] >= 1
    matches = [r["avg_match"] for r in rows]
    assert matches == sorted(matches, reverse=True)


def test_career_paths_empty_when_no_match(postings):
    paths = career_path_recommendations(postings, ["cobol"], n=5)
    assert paths.count() == 0


def test_suggest_skills_prefix(postings):
    from big_data_spark.operators.recommender import suggest_skills

    sug = suggest_skills(postings, "skill1", n=20).collect()
    assert sug, "no suggestions"
    for r in sug:
        assert r["skill"].startswith("skill1")
    freqs = [r["frequency"] for r in sug]
    assert freqs == sorted(freqs, reverse=True)


def test_topk_plans_have_no_unpartitioned_window(postings):
    """Every recommender top-n must plan as TakeOrderedAndProject —
    a per-partition partial top-k — never row_number over a global
    Window.orderBy, which funnels the whole table through one task."""
    from big_data_spark.operators.recommender import suggest_skills

    frames = [
        recommend_skills_for_job(postings, "Engineer", ["Python"], n=5),
        career_path_recommendations(postings, ["Python", "SQL"], n=5),
        suggest_skills(postings, "skill1", n=5),
    ]
    for df in frames:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan
        assert "Window" not in plan, plan
