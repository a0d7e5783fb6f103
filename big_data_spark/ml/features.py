"""Feature engineering for the job-domain ML pipelines.

Behavior parity (cited, no code copied):
  - salary_final / exp_final coalesce chains -> train_kmeans.py:39-52
  - one-hot text flags (city/fields/position)  -> train_kmeans.py:56-94
  - sanity filter (0 < salary <= 200, 0 <= exp <= 30)
                                              -> train_kmeans.py:100-105
  - derived counts (num_skills/num_fields/title_length)
                  -> ml_train_from_cassandra_pyspark.pyc:215
  - rule-based attractiveness -> streamlit_app.py:130-141 (§2.12)

All flags are when/rlike expressions (codegen-friendly); at 100 TB
this stage is a shuffle-free map over the cleaned table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CITY_FLAGS = {
    "is_hcm": "hồ chí minh|hcm",
    "is_hanoi": "hà nội|ha noi|hanoi",
    "is_danang": "đà nẵng|da nang",  # train_random_forest.py:66
}
FIELD_FLAGS = {
    "is_it": "it|phần mềm|developer|lập trình|data|ai",
    "is_sales": "bán hàng|kinh doanh|sales|tiếp thị|marketing",
    "is_finance": "tài chính|ngân hàng|kế toán|finance|banking",
    "is_education": "giáo dục|đào tạo|giáo viên|education",
    "is_engineering": "kỹ thuật|cơ khí|điện|xây dựng|engineer",  # :89
}
POSITION_FLAGS = {
    # 7-level ladder, train_random_forest.py:94-136
    "is_intern": "thực tập|intern|internship",
    "is_fresher": "fresher|mới ra trường|sinh viên mới",
    "is_junior": "junior",
    "is_staff": "nhân viên|chuyên viên|staff|employee",
    "is_senior": "senior|chuyên gia|chuyên viên cao cấp",
    "is_team_lead": "trưởng nhóm|team lead|leader|tech lead",
    "is_manager": "trưởng|quản lý|giám đốc|manager|lead|head",
}

# The 16-feature serving/RF set (train_random_forest.py:151-168)
RF_FEATURES = [
    "exp_final",
    "is_hcm",
    "is_hanoi",
    "is_danang",
    "is_it",
    "is_sales",
    "is_finance",
    "is_education",
    "is_engineering",
    "is_intern",
    "is_fresher",
    "is_junior",
    "is_staff",
    "is_senior",
    "is_team_lead",
    "is_manager",
]

CLUSTERING_FEATURES = [
    "salary_final",
    "exp_final",
    "is_hcm",
    "is_hanoi",
    "is_it",
    "is_sales",
    "is_finance",
    "is_education",
    "is_manager",
    "is_senior",
]


def _flag(src: Column, pattern: str) -> Column:
    return F.when(src.rlike(pattern), 1.0).otherwise(0.0)


def job_features(df: DataFrame, sanity_filter: bool = True) -> DataFrame:
    """Cleaned postings -> numeric feature columns.

    Expects the clean_job_postings output schema; tolerates absent
    optional columns (job_fields / position_level default to empty).
    """
    for optional in ("job_fields", "position_level", "skills", "job_title"):
        if optional not in df.columns:
            df = df.withColumn(optional, F.lit(""))
    out = (
        df.withColumn(
            "salary_final",
            F.coalesce(
                F.col("salary_avg"),
                (F.col("salary_min") + F.col("salary_max")) / 2,
                F.lit(0.0),
            ),
        )
        .withColumn(
            "exp_final",
            F.coalesce(F.col("exp_avg_year"), F.col("exp_min_year"), F.lit(0.0)),
        )
    )
    city = F.lower(F.col("city"))
    fields = F.lower(F.col("job_fields"))
    pos = F.lower(F.col("position_level"))
    for name, pat in CITY_FLAGS.items():
        out = out.withColumn(name, _flag(city, pat))
    for name, pat in FIELD_FLAGS.items():
        out = out.withColumn(name, _flag(fields, pat))
    for name, pat in POSITION_FLAGS.items():
        out = out.withColumn(name, _flag(pos, pat))
    out = (
        out.withColumn(
            "num_skills", F.size(F.split(F.coalesce(F.col("skills"), F.lit("")), ","))
        )
        .withColumn(
            "num_fields",
            F.size(F.split(F.coalesce(F.col("job_fields"), F.lit("")), ",")),
        )
        .withColumn("title_length", F.length(F.coalesce(F.col("job_title"), F.lit(""))))
    )
    if sanity_filter:
        out = out.filter(
            (F.col("salary_final") > 0)
            & (F.col("salary_final") <= 200)
            & (F.col("exp_final") >= 0)
            & (F.col("exp_final") <= 30)
        )
    return out.na.fill({c: 0.0 for c in CLUSTERING_FEATURES})


def attractiveness_rule(salary: Column, exp: Column) -> Column:
    """Rule classifier (§2.12): hot iff (salary>=15 and exp<=2) or
    salary>=30 — the label the ghost v2 logistic model learns."""
    return F.when(
        ((salary >= 15) & (exp <= 2)) | (salary >= 30), 1.0
    ).otherwise(0.0)
