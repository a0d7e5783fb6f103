"""Live-broker Kafka end-to-end smoke (S1/S2, job_streaming.py:47-53
parity). Skips without KAFKA_BOOTSTRAP — see docs/kafka.md for the
docker-compose recipe; the sandbox has no broker, no Docker, and no
network to fetch the connector jar, so the skip is an environment
decision. Broker-less coverage of every layer below the socket lives
in tests/test_streaming.py (config-swap + wire-schema parity tests).
"""

from __future__ import annotations

import json
import os

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")


@pytest.mark.skipif(
    not BOOTSTRAP,
    reason=(
        "live-broker smoke needs KAFKA_BOOTSTRAP=<host:port> and the "
        "spark-sql-kafka connector on the classpath (see docs/kafka.md); "
        "this environment has no broker"
    ),
)
def test_kafka_end_to_end_consume(spark, tmp_path):
    """Produce postings to a real topic with the batch Kafka sink,
    consume them via read_postings_kafka -> clean_job_postings ->
    parquet, and check the landed rows equal the batch-cleaned input."""
    from pyspark.sql import functions as F

    from big_data_spark.fixtures import JOBS_COLUMNS, JOBS_CORPUS
    from big_data_spark.operators.job_etl import clean_job_postings
    from big_data_spark.streaming import read_postings_kafka

    topic = f"bds_smoke_{os.getpid()}"
    records = [dict(zip(JOBS_COLUMNS, row)) for row in JOBS_CORPUS]
    (
        spark.createDataFrame(
            [(json.dumps(r),) for r in records], ["value"]
        )
        .select(F.col("value").cast("binary"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )

    parsed = read_postings_kafka(spark, BOOTSTRAP, topic)
    cleaned = clean_job_postings(parsed, deterministic_id=True)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        cleaned.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    landed = spark.read.parquet(sink)
    want = clean_job_postings(
        spark.createDataFrame(JOBS_CORPUS, JOBS_COLUMNS),
        deterministic_id=True,
    )
    assert landed.count() == want.count()
    cols = sorted(set(want.columns) - {"id"})
    assert sorted(map(tuple, landed.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )
