"""Explicit StructType contracts (SURVEY.md §1.3-1.4, FIXTURES.md).

The reference declares its stream-ingest schema explicitly
(job_streaming.py:27-41) and relies on permissive from_json nulls for
malformed rows; we keep the same contract-first stance for every
table the engine owns.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Raw posting — job_streaming.py:27-41 / real_time_data_simulation.py:65-79
JOB_POSTING_RAW_SCHEMA = StructType(
    [
        StructField("job_title", StringType()),
        StructField("job_type", StringType()),
        StructField("position_level", StringType()),
        StructField("city", StringType()),
        StructField("experience", StringType()),
        StructField("skills", StringType()),
        StructField("job_fields", StringType()),
        StructField("salary", StringType()),
        StructField("salary_min", DoubleType()),
        StructField("salary_max", DoubleType()),
        StructField("unit", StringType()),
        StructField("event_time", StringType()),
        StructField("event_type", StringType()),
    ]
)

# job_clusters output — train_kmeans.py:275-278
JOB_CLUSTERS_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("job_title", StringType()),
        StructField("city", StringType()),
        StructField("salary_final", DoubleType()),
        StructField("exp_final", DoubleType()),
        StructField("job_fields", StringType()),
        StructField("position_level", StringType()),
        StructField("cluster", IntegerType()),
    ]
)

# skill_hot_scores output — train_gbt.py:226-234
SKILL_HOT_SCORES_SCHEMA = StructType(
    [
        StructField("skill", StringType()),
        StructField("job_count", IntegerType()),
        StructField("avg_salary", DoubleType()),
        StructField("avg_exp", DoubleType()),
        StructField("big_city_ratio", DoubleType()),
        StructField("skill_hot_score", DoubleType()),
        StructField("predicted_hot_score", DoubleType()),
    ]
)

# model registry — CQL DDL at ml_train_from_cassandra_pyspark.pyc:461
ML_MODELS_SCHEMA = StructType(
    [
        StructField("model_id", StringType()),
        StructField("model_name", StringType()),
        StructField("model_type", StringType()),
        StructField("training_date", TimestampType()),
        StructField("accuracy", DoubleType()),
        StructField("mae", DoubleType()),
        StructField("rmse", DoubleType()),
        StructField("r2_score", DoubleType()),
        StructField("feature_columns", ArrayType(StringType())),
        StructField("model_path", StringType()),
        StructField("version", IntegerType()),
    ]
)

# events stream table (TESTDATA.md)
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)
