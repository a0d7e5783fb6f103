"""ML pipelines (SURVEY §2.10 / §5): metric-threshold + invariant
tests at fixed seed, the reference's own acceptance style.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from big_data_spark.fixtures import synthetic_postings
from big_data_spark.ml.features import attractiveness_rule, job_features
from big_data_spark.ml.pipelines import (
    VN_STOP_WORDS_GBT,
    VN_STOP_WORDS_LR,
    adaptive_rf_params,
    fit_attractiveness_lr,
    fit_gbt_salary,
    fit_job_clustering,
    fit_salary_rf,
    fit_skill_hot_gbt,
    fit_skill_word2vec,
    fit_topic_lda,
)
from big_data_spark.ml.registry import latest_model, register_model
from big_data_spark.operators.job_etl import clean_job_postings
from big_data_spark.operators.skills import skill_hot_scores

from .conftest import SF_ORACLE

N_ROWS = 4000


@pytest.fixture(scope="module")
def featured(spark):
    clean = clean_job_postings(synthetic_postings(spark, N_ROWS), deterministic_id=True)
    return job_features(clean).cache()


def test_job_features_flags(featured):
    row = featured.filter(F.col("city") == "Hồ Chí Minh").first()
    assert row["is_hcm"] == 1.0 and row["is_hanoi"] == 0.0
    assert featured.filter(F.col("is_it") == 1.0).count() == featured.count()
    # sanity filter bounds hold
    bad = featured.filter(
        (F.col("salary_final") <= 0) | (F.col("salary_final") > 200)
    ).count()
    assert bad == 0


def test_kmeans_clustering(featured):
    res = fit_job_clustering(featured, k=5)
    sizes = {
        r["cluster"]: r["count"]
        for r in res.predictions.groupBy("cluster").count().collect()
    }
    assert len(sizes) == 5  # k distinct clusters materialize
    assert sum(sizes.values()) == featured.count()
    # reference achieved 0.296 on real data; synthetic one-hot data
    # separates far more cleanly — just require a sane silhouette
    assert res.metrics["silhouette"] > 0.2


def test_skill_hot_gbt(spark):
    clean = clean_job_postings(
        synthetic_postings(spark, N_ROWS), deterministic_id=True
    )
    agg = skill_hot_scores(clean, min_jobs=10)
    res = fit_skill_hot_gbt(agg)
    # GBT on its own training signal must basically reproduce it
    assert res.metrics["r2"] > 0.5, res.metrics
    assert res.metrics["rmse"] < 0.2, res.metrics
    imps = res.model.stages[-1].featureImportances.toArray()
    assert math.isclose(sum(imps), 1.0, rel_tol=1e-6)


def test_salary_rf_and_adaptive_params(featured):
    res = fit_salary_rf(featured, adaptive=True)
    # 4000 rows -> (60, 15) per the size-stepped table
    assert res.metrics["num_trees"] == 60.0
    assert res.metrics["rmse"] > 0
    assert adaptive_rf_params(100) == (30, 8)
    assert adaptive_rf_params(999) == (40, 10)
    assert adaptive_rf_params(1999) == (50, 12)
    assert adaptive_rf_params(4999) == (60, 15)
    assert adaptive_rf_params(100000) == (75, 18)


def test_attractiveness_rule_and_lr(featured):
    labeled = featured.withColumn(
        "want", attractiveness_rule(F.col("salary_final"), F.col("exp_final"))
    )
    # rule classifier is deterministic: spot-check both branches
    assert labeled.filter((F.col("salary_final") >= 30) & (F.col("want") != 1.0)).count() == 0
    sample = labeled.limit(2000)
    res = fit_attractiveness_lr(sample)
    assert res.metrics["accuracy"] > 0.85, res.metrics
    # Exact 10-stage ghost-pipeline structure
    # (models/job_attractiveness_lr_v1/stages/00_-09_*/metadata)
    names = [type(s).__name__ for s in res.model.stages]
    assert names == [
        "StringIndexerModel", "OneHotEncoderModel", "StringIndexerModel",
        "OneHotEncoderModel", "Tokenizer", "StopWordsRemover",
        "HashingTF", "IDFModel", "VectorAssembler", "LogisticRegressionModel",
    ], names
    stop = res.model.stages[5]
    assert stop.getStopWords() == VN_STOP_WORDS_LR
    assert len(VN_STOP_WORDS_LR) == 22
    assert res.model.stages[6].getNumFeatures() == 3000
    assert res.model.stages[8].getInputCols() == [
        "experience_years", "city_vec", "pos_vec", "text_vec",
    ]
    lr_stage = res.model.stages[9]
    assert lr_stage.getRegParam() == 0.01 and lr_stage.getElasticNetParam() == 0.8


def test_gbt_salary_ghost_pipeline(featured):
    # M18: gbt_salary_model reconstruction — full stage list + params
    # (models/gbt_salary_model/stages/00_-09_*/metadata). max_iter
    # lowered from the reference's 100 to keep the test fast; the
    # persisted param default is asserted separately.
    res = fit_gbt_salary(featured.limit(1500), max_iter=20)
    names = [type(s).__name__ for s in res.model.stages]
    assert names == [
        "StringIndexerModel", "OneHotEncoderModel", "StringIndexerModel",
        "OneHotEncoderModel", "Tokenizer", "StopWordsRemover",
        "HashingTF", "IDFModel", "VectorAssembler", "GBTRegressionModel",
    ], names
    assert res.model.stages[5].getStopWords() == VN_STOP_WORDS_GBT
    assert len(VN_STOP_WORDS_GBT) == 23
    gbt = res.model.stages[9]
    assert gbt.getMaxDepth() == 8 and gbt.getStepSize() == 0.05
    # reference default is the published maxIter=100
    import inspect

    assert inspect.signature(fit_gbt_salary).parameters["max_iter"].default == 100
    # assembled width = 1 + (|city|+1) + (|pos|+1) + 3000 hashing buckets
    assert gbt.numFeatures > 3000
    assert res.metrics["rmse"] > 0 and res.metrics["r2"] > -1.0, res.metrics


def test_word2vec_and_lda(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", F.split("text", " ").alias("tokens")
    )
    w2v = fit_skill_word2vec(docs, vector_size=16)
    syns = w2v.model.stages[0].findSynonyms("table", 3).collect()
    assert len(syns) == 3
    # M19 Normalizer: doc vectors are L2-normalized for cosine use
    vec = w2v.predictions.select("doc_vec_norm").first()[0]
    assert math.isclose(float(vec.norm(2)), 1.0, rel_tol=1e-6)
    lda = fit_topic_lda(docs, k=5, max_iter=10)
    assert lda.metrics["log_perplexity"] > 0
    topics = lda.model.stages[-1].describeTopics(5)
    assert topics.count() == 5


def test_model_registry_roundtrip(spark, tmp_path):
    path = str(tmp_path / "registry")
    import datetime

    register_model(
        spark, path, "salary_rf", "regression",
        {"rmse": 7.9, "mae": 5.0, "r2": 0.26},
        ["exp_final", "is_manager"], "/models/salary_rf", version=1,
        training_date=datetime.datetime(2024, 1, 1, 0, 0, 0),
    )
    register_model(
        spark, path, "salary_rf", "regression",
        {"rmse": 7.5, "mae": 4.8, "r2": 0.31},
        ["exp_final", "is_manager", "num_skills"], "/models/salary_rf_v2", version=2,
        training_date=datetime.datetime(2024, 2, 1, 0, 0, 0),
    )
    latest = latest_model(spark, path, "salary_rf")
    assert latest["version"] == 2
    assert latest["r2_score"] == pytest.approx(0.31)
    assert latest["feature_columns"] == ["exp_final", "is_manager", "num_skills"]


def test_model_save_load_roundtrip(spark, tmp_path, featured):
    res = fit_job_clustering(featured.limit(800), k=3)
    path = str(tmp_path / "kmeans_model")
    res.model.write().overwrite().save(path)
    from pyspark.ml import PipelineModel

    loaded = PipelineModel.load(path)
    a = res.model.transform(featured.limit(100)).select("cluster").collect()
    b = loaded.transform(featured.limit(100)).select("cluster").collect()
    assert a == b


def test_fpgrowth_matches_copurchase_pairs(spark):
    """Engine cross-check: MLlib FPGrowth over per-order baskets must
    reproduce q128's size-2 frequent itemsets (pair + support count)
    exactly — two independent implementations of A-priori support
    counting (tree projection vs self-join/group-by) agreeing on the
    same corpus."""
    from pyspark.ml.fpm import FPGrowth

    from .conftest import SF_SMOKE

    op = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    baskets = op.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("items")
    )
    n_baskets = baskets.count()
    # threshold strictly between 1 and 2 orders => freq >= 2
    model = FPGrowth(
        itemsCol="items", minSupport=1.5 / n_baskets, minConfidence=0.9
    ).fit(baskets)
    fp_pairs = {
        (min(r["items"]), max(r["items"])): r["freq"]
        for r in model.freqItemsets.collect()
        if len(r["items"]) == 2
    }
    a = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    sql_pairs = {
        (r["pa"], r["pb"]): r["n"]
        for r in a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .collect()
    }
    assert fp_pairs == sql_pairs
    assert len(sql_pairs) > 100  # non-trivial corpus


def test_lr_coefficients_score_natively(spark):
    """q129's scale claim, closed with a REAL trained model: a fitted
    LogisticRegression's coefficients, exported and re-applied as
    native column arithmetic (sigmoid(w.x + b)), must reproduce
    MLlib's transform() probabilities — proving trained weights swap
    into the map-only scoring plan without changing it."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from .conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    feats = docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("double").alias("label"),
        F.size(toks).cast("double").alias("f_ntok"),
        (F.col("n_chars") / F.size(toks)).alias("f_avglen"),
        (
            F.size(F.filter(toks, lambda t: t.isin("the", "a", "of")))
            / F.size(toks)
        ).alias("f_stop"),
    )
    fcols = ["f_ntok", "f_avglen", "f_stop"]
    assembled = VectorAssembler(
        inputCols=fcols, outputCol="features"
    ).transform(feats)
    model = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=25, regParam=0.01
    ).fit(assembled)
    w = model.coefficients.toArray().tolist()
    b = float(model.intercept)

    z = F.lit(b)
    for wi, c in zip(w, fcols):
        z = z + F.lit(wi) * F.col(c)
    native = feats.select(
        "doc_id", (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("p_native")
    )
    from pyspark.ml.functions import vector_to_array

    probs = model.transform(assembled).select(
        "doc_id",
        F.element_at(vector_to_array("probability"), 2).alias("p_ml"),
    )
    joined = native.join(probs, "doc_id")
    max_diff = joined.agg(
        F.max(F.abs(F.col("p_native") - F.col("p_ml")))
    ).first()[0]
    assert max_diff < 1e-9, max_diff
    # and the native plan is map-only: no shuffle, no Python
    from big_data_spark.plans import count_shuffles, formatted_plan

    assert count_shuffles(native) == 0, formatted_plan(native)
    assert "PythonUDF" not in formatted_plan(native)
