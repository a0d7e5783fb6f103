"""Serving-edge inference (M20): persistent-session scoring + the
per-position clamp rules, golden-tested against hand-derived values
(streamlit_app.py:620-636 semantics)."""

from __future__ import annotations

import pytest

from big_data_spark.fixtures import synthetic_postings
from big_data_spark.ml.features import RF_FEATURES, job_features
from big_data_spark.ml.pipelines import fit_salary_rf
from big_data_spark.ml.serving import (
    SalaryPredictor,
    clamp_salary,
)
from big_data_spark.operators.job_etl import clean_job_postings

CLAMP_GOLDEN = [
    # (raw, position, is_it, expected)
    (3.0, "junior", False, 7.0),  # below floor -> floor
    (50.0, "junior", False, 15.0),  # above ceiling -> ceiling
    (12.0, "junior", False, 12.0),  # in band -> unchanged
    (12.0, "junior", True, 14.4),  # IT bonus x1.2 inside band
    (14.0, "junior", True, 15.0),  # bonus capped at ceiling
    (15.0, "junior", True, 15.0),  # at ceiling -> no bonus applied
    (40.0, "manager", True, 48.0),  # manager band is wider
    (999.0, "unknown_position", False, 100.0),  # default band ceiling
    (1.0, "intern", False, 2.0),
]


@pytest.mark.parametrize("raw,pos,is_it,want", CLAMP_GOLDEN)
def test_clamp_golden(raw, pos, is_it, want):
    assert clamp_salary(raw, pos, is_it) == pytest.approx(want)


def test_single_row_inference_roundtrip(spark, tmp_path):
    clean = clean_job_postings(synthetic_postings(spark, 1500), deterministic_id=True)
    featured = job_features(clean)
    # non-adaptive = the 16-numeric-feature model streamlit serves
    # (the adaptive Cassandra-trainer variant adds StringIndexed
    # categoricals and is exercised in test_ml)
    res = fit_salary_rf(featured, adaptive=False)
    path = str(tmp_path / "salary_rf")
    res.model.write().overwrite().save(path)

    predictor = SalaryPredictor.load(spark, path)
    feats = {"exp_final": 3.0, "is_hcm": 1.0, "is_it": 1.0, "is_senior": 1.0}
    raw = predictor.predict_raw(feats)
    assert raw > 0
    clamped = predictor.predict(feats, position="senior")
    floor, ceiling = 18.0, 45.0
    assert floor <= clamped <= ceiling
    # same input -> same output through the persistent session
    assert predictor.predict(feats, position="senior") == clamped
