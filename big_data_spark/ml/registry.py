"""Model registry (S6/O3): the jobdb.ml_models table as an
append-mode parquet DataFrame.

Parity: DDL + save_model_metadata at
ml_train_from_cassandra_pyspark.pyc:461/:390 (model_id uuid PK,
metrics, feature_columns list, versioning); latest-model lookup is
orderBy(training_date desc).first() (pyc:540).
"""

from __future__ import annotations

import datetime as _dt
import os
import uuid

from pyspark.sql import DataFrame, Row, SparkSession

from ..schemas import ML_MODELS_SCHEMA


def register_model(
    spark: SparkSession,
    registry_path: str,
    model_name: str,
    model_type: str,
    metrics: dict[str, float],
    feature_columns: list[str],
    model_path: str,
    version: int = 1,
    training_date: _dt.datetime | None = None,
) -> str:
    """Append one registry row; returns the model_id."""
    model_id = str(uuid.uuid4())
    row = Row(
        model_id=model_id,
        model_name=model_name,
        model_type=model_type,
        training_date=training_date or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None),
        accuracy=float(metrics.get("accuracy", float("nan"))),
        mae=float(metrics.get("mae", float("nan"))),
        rmse=float(metrics.get("rmse", float("nan"))),
        r2_score=float(metrics.get("r2", float("nan"))),
        feature_columns=list(feature_columns),
        model_path=model_path,
        version=version,
    )
    spark.createDataFrame([row], ML_MODELS_SCHEMA).write.mode("append").parquet(
        registry_path
    )
    return model_id


def load_registry(spark: SparkSession, registry_path: str) -> DataFrame:
    if not os.path.exists(registry_path):
        return spark.createDataFrame([], ML_MODELS_SCHEMA)
    return spark.read.schema(ML_MODELS_SCHEMA).parquet(registry_path)


def latest_model(
    spark: SparkSession, registry_path: str, model_name: str | None = None
) -> Row | None:
    """Most recent registry row (O3 orderBy desc + first)."""
    df = load_registry(spark, registry_path)
    if model_name is not None:
        df = df.filter(df.model_name == model_name)
    return df.orderBy(df.training_date.desc()).first()
