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
    Normalizer,
    OneHotEncoder,
    RegexTokenizer,
    StandardScaler,
    StopWordsRemover,
    StringIndexer,
    Tokenizer,
    VectorAssembler,
    Word2Vec,
)
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.regression import GBTRegressor, RandomForestRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .features import CLUSTERING_FEATURES

SEED = 42

# Vietnamese stop-word lists recovered verbatim from the ghost-pipeline
# artifacts (models/*/stages/05_StopWordsRemover_*/metadata) — each
# saved model pins its own list.
VN_STOP_WORDS_LR = [  # job_attractiveness_lr_v1 (22 words)
    "của", "và", "các", "có", "làm", "tại", "trong", "được", "với", "là",
    "người", "những", "cho", "về", "nhân viên", "công ty", "tuyển",
    "lương", "tháng", "mô tả", "yêu cầu", "chi nhánh",
]
VN_STOP_WORDS_GBT = [  # gbt_salary_model (23 words)
    "của", "và", "các", "có", "làm", "tại", "trong", "được", "với", "là",
    "người", "nhân viên", "công ty", "tuyển", "hcm", "hn", "lương",
    "tháng", "yêu cầu", "mô tả", "chi nhánh", "trách nhiệm", "quyền lợi",
]

# Stage-08 assembler inputs, shared by every ghost pipeline
# (models/gbt_salary_model/stages/08_VectorAssembler_*/metadata).
GHOST_FEATURE_COLS = ["experience_years", "city_vec", "pos_vec", "text_vec"]


def ghost_prep_stages(stop_words: list[str]) -> list:
    """Stages 00-08 shared by the ghost pipelines
    (job_attractiveness_lr_v1 / job_attractiveness_v1 /
    gbt_salary_model all persist this exact prep chain —
    models/gbt_salary_model/stages/00_-08_*/metadata): indexed+one-hot
    city and position_level, tokenized full_text_features with a
    Vietnamese stop-word filter, 3000-bucket hashed TF-IDF, assembled
    with experience_years."""
    return [
        StringIndexer(inputCol="city", outputCol="city_idx", handleInvalid="keep"),
        OneHotEncoder(inputCols=["city_idx"], outputCols=["city_vec"]),
        StringIndexer(
            inputCol="position_level", outputCol="pos_idx", handleInvalid="keep"
        ),
        OneHotEncoder(inputCols=["pos_idx"], outputCols=["pos_vec"]),
        Tokenizer(inputCol="full_text_features", outputCol="words_raw"),
        StopWordsRemover(
            inputCol="words_raw", outputCol="words_clean", stopWords=list(stop_words)
        ),
        HashingTF(inputCol="words_clean", outputCol="tf_features", numFeatures=3000),
        IDF(inputCol="tf_features", outputCol="text_vec"),
        VectorAssembler(inputCols=GHOST_FEATURE_COLS, outputCol="features"),
    ]


def with_ghost_text_features(featured: DataFrame) -> DataFrame:
    """Adds the ghost pipelines' input columns to a job_features frame:
    full_text_features (F19 concat_ws text assembly consumed by
    Tokenizer.inputCol, models/gbt_salary_model/stages/04_*/metadata)
    and experience_years / avg_salary aliases."""
    return (
        featured.withColumn(
            "full_text_features",
            F.concat_ws(
                " ",
                F.coalesce(F.col("job_title"), F.lit("")),
                F.coalesce(F.col("skills"), F.lit("")),
                F.coalesce(F.col("job_fields"), F.lit("")),
            ),
        )
        .withColumn("experience_years", F.col("exp_final").cast("double"))
        .withColumn("avg_salary", F.col("salary_final").cast("double"))
    )


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
    """rmse/mae/r2 triple (M7, train_gbt.py:172-191) in ONE pass.

    Three RegressionEvaluator.evaluate calls re-ran the full
    prediction chain (assembler -> scaler -> 100-tree predict) once
    PER METRIC (guide §1.2: don't compute things you throw away);
    one aggregation computes the same standard definitions the
    evaluator uses — rmse = sqrt(mean((y-p)^2)), mae = mean(|y-p|),
    r2 = 1 - SS_res/SS_tot with SS_tot = sum((y-mean(y))^2), nulls
    excluded the same way (evaluator drops rows it cannot score)."""
    err = F.col(label) - F.col("prediction")
    row = predictions.agg(
        F.avg(err * err).alias("mse"),
        F.avg(F.abs(err)).alias("mae"),
        F.var_pop(F.col(label)).alias("vy"),  # stable one-pass moment
    ).first()
    return {
        "rmse": float(row["mse"]) ** 0.5,
        "mae": float(row["mae"]),
        "r2": 1.0 - float(row["mse"]) / float(row["vy"]),
    }


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
    prep_stages: list = []
    if adaptive:
        n_trees, depth = adaptive_rf_params(featured.count())
        # The bytecode-only trainer (ml_train_from_cassandra_pyspark
        # .pyc:215) StringIndexes all four string categoricals with
        # handleInvalid="keep" and feeds the indices to the RF (M11).
        cat_cols = ["city", "job_type", "position_level", "experience"]
        for c in cat_cols:
            if c not in featured.columns:
                featured = featured.withColumn(c, F.lit(""))
        prep_stages = [
            StringIndexer(
                inputCol=c, outputCol=f"{c}_cat_idx", handleInvalid="keep"
            )
            for c in cat_cols
        ]
        feature_cols = feature_cols + [f"{c}_cat_idx" for c in cat_cols]
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
    model = Pipeline(stages=[*prep_stages, assembler, scaler, rf]).fit(train)
    pred = model.transform(test)
    metrics = _regression_metrics(pred, "salary_final")
    rf_model = model.stages[-1]
    metrics["num_trees"] = float(rf_model.getNumTrees)
    return FitResult(model, pred, metrics)


def fit_attractiveness_lr(featured: DataFrame) -> FitResult:
    """Ghost-pipeline reconstruction (M11-M14, M17): the exact
    10-stage job_attractiveness_lr_v1 chain —
    StringIndexer(city)+OHE, StringIndexer(position_level)+OHE,
    Tokenizer/StopWordsRemover(22-word VN list)/HashingTF(3000)/IDF,
    VectorAssembler([experience_years, city_vec, pos_vec, text_vec]),
    LogisticRegression(label=is_attractive, regParam=0.01,
    elasticNetParam=0.8) — stage params verbatim from
    models/job_attractiveness_lr_v1/stages/00_-09_*/metadata."""
    from .features import attractiveness_rule

    df = with_ghost_text_features(featured).withColumn(
        "is_attractive",
        attractiveness_rule(F.col("salary_final"), F.col("exp_final")),
    )
    lr = LogisticRegression(
        labelCol="is_attractive",
        featuresCol="features",
        regParam=0.01,
        elasticNetParam=0.8,
    )
    model = Pipeline(stages=[*ghost_prep_stages(VN_STOP_WORDS_LR), lr]).fit(df)
    pred = model.transform(df)
    acc = pred.select(
        F.avg((F.col("prediction") == F.col("is_attractive")).cast("double")).alias("a")
    ).first()["a"]
    return FitResult(model, pred, {"accuracy": acc})


def fit_gbt_salary(featured: DataFrame, max_iter: int = 100) -> FitResult:
    """Text-features GBT salary model (M18): the gbt_salary_model
    ghost pipeline — shared 9-stage prep (23-word VN stop list) +
    GBTRegressor(label=avg_salary, maxIter=100, maxDepth=8,
    stepSize=0.05), matching
    models/gbt_salary_model/stages/00_-09_*/metadata (saved model
    reports numFeatures=3489 = 1 + |city|+1 + |pos|+1 + 3000).
    max_iter is a knob so tests stay fast; the reference value 100 is
    the default."""
    df = with_ghost_text_features(featured)
    gbt = GBTRegressor(
        labelCol="avg_salary",
        featuresCol="features",
        maxIter=max_iter,
        maxDepth=8,
        stepSize=0.05,
        seed=SEED,
    )
    train, test = df.randomSplit([0.8, 0.2], seed=SEED)
    model = Pipeline(stages=[*ghost_prep_stages(VN_STOP_WORDS_GBT), gbt]).fit(train)
    pred = model.transform(test)
    return FitResult(model, pred, _regression_metrics(pred, "avg_salary"))


def regex_tokenize(df: DataFrame, input_col: str, output_col: str = "tokens") -> DataFrame:
    """Whitespace RegexTokenizer (M19) — the reference's tokenizer for
    the skills-recommendation corpus (ml_skills_recommendation.pyc
    header imports RegexTokenizer alongside Normalizer)."""
    return RegexTokenizer(
        inputCol=input_col, outputCol=output_col, pattern=r"\s+"
    ).transform(df)


def fit_skill_word2vec(token_df: DataFrame, vector_size: int = 50) -> FitResult:
    """Word2Vec skill embeddings (M15): vectorSize=100, minCount=5,
    windowSize=10 in the reference (ml_skills_recommendation.pyc:66);
    vector_size is a knob so tests run fast. Embeddings are
    L2-normalized (M19 Normalizer, same .pyc header import) so cosine
    similarity reduces to a dot product downstream."""
    w2v = Word2Vec(
        vectorSize=vector_size,
        minCount=5,
        windowSize=10,
        inputCol="tokens",
        outputCol="doc_vec",
        seed=SEED,
    )
    norm = Normalizer(inputCol="doc_vec", outputCol="doc_vec_norm", p=2.0)
    model = Pipeline(stages=[w2v, norm]).fit(token_df)
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
