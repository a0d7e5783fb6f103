"""Serving-edge single-row inference (M20) done right.

Parity target: streamlit_app.py:573-636 — 16-double feature row ->
PipelineModel.transform -> business clamp (per-position floor/ceiling
+ IT x1.2 bonus capped at the ceiling). The reference spins up a
fresh local SparkSession per prediction (:540-543, a flagged design
smell, SURVEY §3.3); here inference runs through a persistent session
and a cached model handle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import PipelineModel
from pyspark.sql import SparkSession
from pyspark.sql.types import DoubleType, StructField, StructType

SERVING_FEATURES = [
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

SERVING_SCHEMA = StructType(
    [StructField(c, DoubleType(), True) for c in SERVING_FEATURES]
)

# per-position (floor, ceiling) in triệu VND — streamlit_app.py:620-628
SALARY_BANDS: dict[str, tuple[float, float]] = {
    "intern": (2.0, 5.0),
    "fresher": (4.0, 10.0),
    "junior": (7.0, 15.0),
    "staff": (10.0, 25.0),
    "senior": (18.0, 45.0),
    "team_lead": (25.0, 60.0),
    "manager": (35.0, 100.0),
}
DEFAULT_BAND = (5.0, 100.0)
IT_BONUS = 1.2


def clamp_salary(raw: float, position: str, is_it: bool) -> float:
    """Business clamp: band floor/ceiling, then IT x1.2 capped at the
    ceiling (streamlit_app.py:630-636)."""
    floor, ceiling = SALARY_BANDS.get(position, DEFAULT_BAND)
    out = max(floor, min(raw, ceiling))
    if is_it and out < ceiling:
        out = min(out * IT_BONUS, ceiling)
    return out


@dataclass
class SalaryPredictor:
    """Persistent-session single-row scorer around a fitted pipeline."""

    spark: SparkSession
    model: PipelineModel

    @classmethod
    def load(cls, spark: SparkSession, model_path: str) -> "SalaryPredictor":
        return cls(spark=spark, model=PipelineModel.load(model_path))

    def predict_raw(self, features: dict[str, float]) -> float:
        row = tuple(float(features.get(c, 0.0)) for c in SERVING_FEATURES)
        df = self.spark.createDataFrame([row], SERVING_SCHEMA)
        return float(self.model.transform(df).select("prediction").first()[0])

    def predict(self, features: dict[str, float], position: str = "staff") -> float:
        raw = self.predict_raw(features)
        return clamp_salary(raw, position, bool(features.get("is_it", 0.0)))
