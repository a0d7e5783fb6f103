"""big_data_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
job-market analytics platform (PucDev2010/big-data) as an idiomatic
Spark engine: declarative DataFrame/SQL logical plans optimized by
Catalyst, Structured Streaming for unbounded sources, MLlib pipelines
for the model zoo, plus large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing).

Layout:
    session     — SparkSession factory with scale-oriented defaults
    catalog     — testdata table catalog / loaders
    fixtures    — golden string corpora (salary/experience parsing)
    operators/  — composable DataFrame -> DataFrame transforms
    functions/  — native column-expression helpers (no slow UDFs)
    streaming/  — structured-streaming wrappers of the batch operators
    ml/         — MLlib pipeline builders + model registry
    queries     — the oracle-checked query inventory (single source of
                  truth consumed by __spark_entry__ and bench.py)
"""

__version__ = "0.1.0"
