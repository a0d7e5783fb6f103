"""MLlib pipeline builders (SURVEY §2.10 M1-M20).

Every pipeline is the standard 3-stage assembler -> scaler ->
estimator shape the reference uses (train_kmeans.py:158,
train_gbt.py:156, train_random_forest.py:214), parameter-pinned to
the published configs, with the adaptive sizing table recovered from
the bytecode-only trainer (ml_train_from_cassandra_pyspark.pyc:285).

Scale notes: MLlib estimators train on the executors; the only
driver-side artifacts are model coefficients. KMeans/GBT/RF all
iterate over a cached feature DataFrame — callers pass data already
column-pruned to the feature columns so the cache holds vectors, not
raw text.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.clustering import LDA, KMeans
from pyspark.ml.evaluation import ClusteringEvaluator, RegressionEvaluator
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    HashingTF,
    OneHotEncoder,
    RegexTokenizer,
    StandardScaler,
    StopWordsRemover,
    StringIndexer,
    VectorAssembler,
    Word2Vec,
)
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.regression import GBTRegressor, RandomForestRegressor
from pyspark.sql import DataFrame

from .features import CLUSTERING_FEATURES

SEED = 42


@dataclass
class FitResult:
    model: PipelineModel
    predictions: DataFrame
    metrics: dict[str, float]


def adaptive_rf_params(n_rows: int) -> tuple[int, int]:
    """Dataset-size-stepped (numTrees, maxDepth) — parity with the
    const table in ml_train_from_cassandra_pyspark.pyc:285."""
    if n_rows < 500:
        return 30, 8
    if n_rows < 1000:
        return 40, 10
    if n_rows < 2000:
        return 50, 12
    if n_rows < 5000:
        return 60, 15
    return 75, 18


def _regression_metrics(predictions: DataFrame, label: str) -> dict[str, float]:
    """rmse/mae/r2 triple (M7, train_gbt.py:172-191)."""
    out = {}
    for metric in ("rmse", "mae", "r2"):
        ev = RegressionEvaluator(
            labelCol=label, predictionCol="prediction", metricName=metric
        )
        out[metric] = ev.evaluate(predictions)
    return out


def fit_job_clustering(df: DataFrame, k: int = 5) -> FitResult:
    """K-Means job clustering (M1-M3, M8): 10 std-scaled features,
    k=5, seed=42 (train_kmeans.py:135-185)."""
    assembler = VectorAssembler(
        inputCols=CLUSTERING_FEATURES, outputCol="features_raw"
    )
    scaler = StandardScaler(
        inputCol="features_raw", outputCol="features", withStd=True, withMean=True
    )
    kmeans = KMeans(k=k, featuresCol="features", predictionCol="cluster", seed=SEED)
    model = Pipeline(stages=[assembler, scaler, kmeans]).fit(df)
    pred = model.transform(df)
    silhouette = ClusteringEvaluator(
        featuresCol="features", predictionCol="cluster", metricName="silhouette"
    ).evaluate(pred)
    return FitResult(model, pred, {"silhouette": silhouette})


def fit_skill_hot_gbt(skill_agg: DataFrame) -> FitResult:
    """GBT hot-score regressor (M4): 4 aggregate features,
    maxIter=50, maxDepth=5, seed=42 (train_gbt.py:121-162)."""
    features = ["avg_salary", "job_count", "avg_exp", "big_city_ratio"]
    assembler = VectorAssembler(inputCols=features, outputCol="features_raw")
    scaler = StandardScaler(
        inputCol="features_raw", outputCol="features", withStd=True, withMean=True
    )
    gbt = GBTRegressor(
        featuresCol="features",
        labelCol="skill_hot_score",
        maxIter=50,
        maxDepth=5,
        seed=SEED,
    )
    train, test = skill_agg.randomSplit([0.8, 0.2], seed=SEED)
    model = Pipeline(stages=[assembler, scaler, gbt]).fit(train)
    pred = model.transform(test)
    return FitResult(model, model.transform(skill_agg), _regression_metrics(pred, "skill_hot_score"))


def fit_salary_rf(
    featured: DataFrame,
    feature_cols: list[str] | None = None,
    adaptive: bool = False,
) -> FitResult:
    """Salary RF regressor (M5, M7, M10): numTrees=100, maxDepth=10,
    seed=42 by default (train_random_forest.py:206-212); adaptive=True
    switches to the size-stepped table with maxBins=32."""
    from .features import RF_FEATURES

    feature_cols = feature_cols or RF_FEATURES
    if adaptive:
        n_trees, depth = adaptive_rf_params(featured.count())
    else:
        n_trees, depth = 100, 10
    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features_raw")
    scaler = StandardScaler(
        inputCol="features_raw", outputCol="features", withStd=True, withMean=True
    )
    rf = RandomForestRegressor(
        featuresCol="features",
        labelCol="salary_final",
        numTrees=n_trees,
        maxDepth=depth,
        maxBins=32,
        seed=SEED,
    )
    train, test = featured.randomSplit([0.8, 0.2], seed=SEED)
    model = Pipeline(stages=[assembler, scaler, rf]).fit(train)
    pred = model.transform(test)
    metrics = _regression_metrics(pred, "salary_final")
    rf_model = model.stages[-1]
    metrics["num_trees"] = float(rf_model.getNumTrees)
    return FitResult(model, pred, metrics)


def fit_attractiveness_lr(featured: DataFrame) -> FitResult:
    """Ghost-pipeline reconstruction (M11-M14, M17): indexed/encoded
    categoricals + tokenized text -> TF-IDF -> LogisticRegression
    (stage params recovered from models/job_attractiveness_lr_v1 and
    gbt_salary_model metadata)."""
    from pyspark.sql import functions as F

    df = featured.withColumn(
        "full_text_features",
        F.concat_ws(
            " ",
            F.coalesce(F.col("job_title"), F.lit("")),
            F.coalesce(F.col("skills"), F.lit("")),
            F.coalesce(F.col("job_fields"), F.lit("")),
        ),
    ).withColumn(
        "is_hot",
        F.when(
            ((F.col("salary_final") >= 15) & (F.col("exp_final") <= 2))
            | (F.col("salary_final") >= 30),
            1.0,
        ).otherwise(0.0),
    )
    city_idx = StringIndexer(
        inputCol="city", outputCol="city_idx", handleInvalid="keep"
    )
    city_vec = OneHotEncoder(inputCol="city_idx", outputCol="city_vec")
    tokenizer = RegexTokenizer(
        inputCol="full_text_features", outputCol="tokens", pattern=r"\s+"
    )
    stop = StopWordsRemover(
        inputCol="tokens",
        outputCol="tokens_clean",
        stopWords=["của", "và", "lương", "tháng", "the", "a", "an"],
    )
    tf = HashingTF(inputCol="tokens_clean", outputCol="tf", numFeatures=3000)
    idf = IDF(inputCol="tf", outputCol="text_vec")
    assembler = VectorAssembler(
        inputCols=["salary_final", "exp_final", "city_vec", "text_vec"],
        outputCol="features",
    )
    lr = LogisticRegression(
        labelCol="is_hot", featuresCol="features", regParam=0.01, elasticNetParam=0.8
    )
    model = Pipeline(
        stages=[city_idx, city_vec, tokenizer, stop, tf, idf, assembler, lr]
    ).fit(df)
    pred = model.transform(df)
    from pyspark.sql import functions as F2

    acc = pred.select(
        F2.avg((F2.col("prediction") == F2.col("is_hot")).cast("double")).alias("a")
    ).first()["a"]
    return FitResult(model, pred, {"accuracy": acc})


def fit_skill_word2vec(token_df: DataFrame, vector_size: int = 50) -> FitResult:
    """Word2Vec skill embeddings (M15): vectorSize=100, minCount=5,
    windowSize=10 in the reference (ml_skills_recommendation.pyc:66);
    vector_size is a knob so tests run fast."""
    w2v = Word2Vec(
        vectorSize=vector_size,
        minCount=5,
        windowSize=10,
        inputCol="tokens",
        outputCol="doc_vec",
        seed=SEED,
    )
    model = w2v.fit(token_df)
    return FitResult(model, model.transform(token_df), {})


def fit_topic_lda(token_df: DataFrame, k: int = 5, max_iter: int = 20) -> FitResult:
    """CountVectorizer + LDA topics (M16): k=5, seed=42, with
    logLikelihood/logPerplexity metrics (ml_skills_recommendation
    .pyc:263)."""
    cv = CountVectorizer(inputCol="tokens", outputCol="tf")
    lda = LDA(k=k, maxIter=max_iter, seed=SEED, featuresCol="tf")
    pipeline = Pipeline(stages=[cv, lda]).fit(token_df)
    tf_df = pipeline.stages[0].transform(token_df)
    lda_model = pipeline.stages[1]
    metrics = {
        "log_likelihood": lda_model.logLikelihood(tf_df),
        "log_perplexity": lda_model.logPerplexity(tf_df),
    }
    return FitResult(pipeline, pipeline.transform(token_df), metrics)
