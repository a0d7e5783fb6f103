"""Skill analytics: explode -> clean -> aggregate -> hot score.

Behavior parity target (train_gbt.py, cited, no code copied):
  - skill explode/clean      -> train_gbt.py:59-67
  - is_big_city flag         -> train_gbt.py:70-73
  - per-skill aggregation    -> train_gbt.py:80-85
  - frequency floor          -> train_gbt.py:88
  - hot-score formula        -> train_gbt.py:102-116
    hot = 0.4*(avg_salary/100) + 0.3*least(job_count/100, 1)
        - 0.2*(avg_exp/10) + 0.1*big_city_ratio

Scale notes: explode multiplies rows by skills-per-posting (~5), then
the groupBy shuffles only (skill, partial-agg) pairs thanks to
map-side combine — shuffle volume is bounded by |vocabulary| x
partitions, not corpus size. No UDFs anywhere, so the whole chain
stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BIG_CITY_RE = "hồ chí minh|hà nội|hcm|ha noi"


def explode_skills(df: DataFrame) -> DataFrame:
    """One row per cleaned skill token (train_gbt.py:59-67)."""
    return (
        df.withColumn("skill", F.explode(F.split(F.lower(F.col("skills")), ",")))
        .withColumn("skill", F.trim(F.col("skill")))
        .filter(F.col("skill") != "")
        .filter(F.length(F.col("skill")) > 1)
    )


def skill_hot_scores(df: DataFrame, min_jobs: int = 10) -> DataFrame:
    """Per-skill stats + weighted hot score over cleaned postings.

    Expects columns: city (string), salary_avg, exp_avg_year
    (double), skills (string). Aggregates use exact decimal sums so
    results are engine-independent (see queries.py determinism notes).
    """
    base = (
        df.select(
            F.lower(F.col("city")).alias("city"),
            F.col("salary_avg").cast("double"),
            F.col("exp_avg_year").cast("double"),
            "skills",
        )
        .na.fill({"salary_avg": 0.0, "exp_avg_year": 0.0, "skills": ""})
        .filter(F.col("skills") != "")
    )
    # flag BEFORE exploding: one regex eval per posting, not per
    # skill token (~Nx fewer at N skills/posting; same result)
    flagged = base.withColumn(
        "is_big_city",
        F.when(F.col("city").rlike(BIG_CITY_RE), 1.0).otherwise(0.0),
    )
    skill_df = explode_skills(flagged)
    agg = skill_df.groupBy("skill").agg(
        F.count("*").alias("job_count"),
        (
            F.sum(F.col("salary_avg").cast("decimal(27,6)")).cast("double")
            / F.count("salary_avg")
        ).alias("avg_salary"),
        (
            F.sum(F.col("exp_avg_year").cast("decimal(27,6)")).cast("double")
            / F.count("exp_avg_year")
        ).alias("avg_exp"),
        (
            F.sum(F.col("is_big_city").cast("decimal(27,1)")).cast("double")
            / F.count("is_big_city")
        ).alias("big_city_ratio"),
    )
    agg = agg.filter(F.col("job_count") >= min_jobs)
    return agg.withColumn(
        "skill_hot_score",
        0.4 * (F.col("avg_salary") / 100.0)
        + 0.3 * F.least(F.col("job_count") / 100.0, F.lit(1.0))
        - 0.2 * (F.col("avg_exp") / 10.0)
        + 0.1 * F.col("big_city_ratio"),
    )


# DuckDB twin over a relation exposing (city, salary_avg,
# exp_avg_year, skills); {min_jobs} is substituted by the caller.
SKILL_HOT_ORACLE_SQL = """
WITH base AS (
  SELECT lower(city) AS city,
         coalesce(salary_avg, 0.0) AS salary_avg,
         coalesce(exp_avg_year, 0.0) AS exp_avg_year,
         coalesce(skills, '') AS skills
  FROM {src}
), nonempty AS (
  SELECT * FROM base WHERE skills <> ''
), exploded AS (
  SELECT city, salary_avg, exp_avg_year,
         trim(unnest(string_split(lower(skills), ','))) AS skill
  FROM nonempty
), cleaned AS (
  SELECT *,
         CASE WHEN regexp_matches(city, 'hồ chí minh|hà nội|hcm|ha noi')
              THEN 1.0 ELSE 0.0 END AS is_big_city
  FROM exploded
  WHERE skill <> '' AND length(skill) > 1
), agg AS (
  SELECT skill,
         COUNT(*) AS job_count,
         CAST(SUM(CAST(salary_avg AS DECIMAL(27,6))) AS DOUBLE) / COUNT(salary_avg) AS avg_salary,
         CAST(SUM(CAST(exp_avg_year AS DECIMAL(27,6))) AS DOUBLE) / COUNT(exp_avg_year) AS avg_exp,
         CAST(SUM(CAST(is_big_city AS DECIMAL(27,1))) AS DOUBLE) / COUNT(is_big_city) AS big_city_ratio
  FROM cleaned GROUP BY skill
)
SELECT skill, job_count, avg_salary, avg_exp, big_city_ratio,
       0.4 * (avg_salary / 100.0) + 0.3 * least(job_count / 100.0, 1.0)
       - 0.2 * (avg_exp / 10.0) + 0.1 * big_city_ratio AS skill_hot_score
FROM agg WHERE job_count >= {min_jobs}
"""
