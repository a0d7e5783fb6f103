"""Skills recommender query flows (SURVEY §3.4).

Parity targets in ml_skills_recommendation.pyc (bytecode-only module;
cited by recovered co_firstlineno):
  - find_similar_skills            -> :351 (Word2Vec findSynonyms)
  - recommend_skills_for_job       -> :406 (contains -> explode ->
    count -> NOT-isin -> top-n)
  - analyze_skill_gap              -> :460 (recommendation minus owned
    + readiness %)
  - get_career_path_recommendations-> :504 (overlap score -> groupBy
    -> filter match > 0.3 -> top-n)

Engine policy (§2.11): the reference's Python UDFs become native
array expressions (functions.set_overlap_ratio); everything else is
filter/explode/groupBy/top-k — the anti-membership is a real LEFT
ANTI join here, which scales past the reference's driver-side isin
list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import set_overlap_ratio
from .skills import explode_skills


def find_similar_skills(w2v_model, skill: str, n: int = 5) -> list[tuple[str, float]]:
    """Word2Vec nearest neighbors for a skill (M15 findSynonyms)."""
    return [
        (r["word"], float(r["similarity"]))
        for r in w2v_model.findSynonyms(skill, n).collect()
    ]


def recommend_skills_for_job(
    postings: DataFrame,
    job_title_substr: str,
    current_skills: list[str],
    n: int = 10,
) -> DataFrame:
    """Most frequent skills for matching jobs, minus already-owned.

    Ownership exclusion is a broadcast LEFT ANTI join instead of
    NOT-isin: same semantics, but the owned set can itself be a table.
    Top-n is ``orderBy().limit()`` — a TakeOrderedAndProject that
    keeps n rows per partition before the single-result gather,
    never funneling the whole frequency table through one task the
    way row_number over an unpartitioned window does.
    """
    matching = postings.filter(
        F.lower(F.col("job_title")).contains(job_title_substr.lower())
    )
    counts = (
        explode_skills(matching)
        .groupBy("skill")
        .agg(F.count("*").alias("frequency"))
    )
    from ..sources.local import local_df

    owned = local_df(
        postings.sparkSession,
        [(s.lower().strip(),) for s in current_skills],
        "skill string",
    )
    return (
        counts.join(F.broadcast(owned), "skill", "left_anti")
        .orderBy(F.desc("frequency"), F.asc("skill"))
        .limit(n)
    )


def analyze_skill_gap(
    postings: DataFrame,
    job_title_substr: str,
    current_skills: list[str],
    n: int = 10,
) -> dict:
    """Gap report: missing top skills + readiness = |owned ∩ top| / |top|.

    The top-n is a TakeOrderedAndProject (``orderBy().limit(n)``) —
    each partition keeps its n best rows, so nothing serializes
    through a single-partition window; the collect is the bounded
    n-row report, not a data-plane read.
    """
    matching = postings.filter(
        F.lower(F.col("job_title")).contains(job_title_substr.lower())
    )
    top = (
        explode_skills(matching)
        .groupBy("skill")
        .agg(F.count("*").alias("frequency"))
        .orderBy(F.desc("frequency"), F.asc("skill"))
        .limit(n)
    )
    top_skills = [r["skill"] for r in top.collect()]
    owned = {s.lower().strip() for s in current_skills}
    missing = [s for s in top_skills if s not in owned]
    readiness = (
        (len(top_skills) - len(missing)) / len(top_skills) if top_skills else 0.0
    )
    return {
        "target": job_title_substr,
        "top_skills": top_skills,
        "missing_skills": missing,
        "readiness": readiness,
    }


def career_path_recommendations(
    postings: DataFrame,
    current_skills: list[str],
    min_match: float = 0.3,
    n: int = 10,
) -> DataFrame:
    """Job titles ranked by skill-set match (native overlap score).

    groupBy (job_title, position_level) with count / avg match /
    avg salary, filtered to match > min_match, top-n (pyc:504 shape).
    """
    user = F.array(*[F.lit(s.lower().strip()) for s in current_skills])
    jobs = postings.filter(
        F.col("skills").isNotNull() & (F.col("skills") != "")
    ).withColumn(
        "job_skills",
        F.array_distinct(
            F.transform(F.split(F.lower("skills"), ","), lambda x: F.trim(x))
        ),
    )
    scored = jobs.withColumn(
        "match_score", set_overlap_ratio(user, F.col("job_skills"))
    )
    pos = (
        F.col("position_level")
        if "position_level" in postings.columns
        else F.lit("unknown")
    )
    return (
        scored.groupBy(F.col("job_title"), pos.alias("position_level"))
        .agg(
            F.count("*").alias("openings"),
            F.avg("match_score").alias("avg_match"),
            F.avg("salary_avg").alias("avg_salary"),
        )
        .filter(F.col("avg_match") > min_match)
        .orderBy(F.desc("avg_match"), F.asc("job_title"))
        .limit(n)
    )


def suggest_skills(postings: DataFrame, prefix: str, n: int = 10) -> DataFrame:
    """Autocomplete: skills starting with ``prefix``, by frequency
    (P10 startswith, parity ml_skills_recommendation.pyc:382).
    Top-n via TakeOrderedAndProject, not an unpartitioned window."""
    return (
        explode_skills(postings)
        .filter(F.col("skill").startswith(prefix.lower()))
        .groupBy("skill")
        .agg(F.count("*").alias("frequency"))
        .orderBy(F.desc("frequency"), F.asc("skill"))
        .limit(n)
    )
