"""Python Data Source API: the synthetic postings generator as a
first-class batch format and an offset-tracked streaming source."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    from big_data_spark.sources.generator import PostingsDataSource

    spark.dataSource.register(PostingsDataSource)


def test_batch_generator_deterministic_and_partitioned(spark):
    df = spark.read.format("postings_gen").option("rows", 500).load()
    assert df.count() == 500
    assert df.columns == ["job_title", "city", "experience", "skills", "salary"]
    # deterministic: same options -> identical content
    again = spark.read.format("postings_gen").option("rows", 500).load()
    assert df.exceptAll(again).count() == 0
    # generation is executor-side and spread over partitions
    assert df.rdd.getNumPartitions() == 4
    # rows are unique (the #i suffix) — partition ranges don't overlap
    assert df.select("job_title").distinct().count() == 500


def test_batch_generator_feeds_etl_chain(spark):
    from big_data_spark.operators.job_etl import clean_job_postings

    raw = spark.read.format("postings_gen").option("rows", 200).load()
    clean = clean_job_postings(raw, deterministic_id=True)
    assert clean.count() == 200
    parsed = clean.filter(F.col("salary_avg").isNotNull()).count()
    assert parsed > 0  # the cycling corpus includes parseable salaries


def test_stream_generator_offsets_and_replay(spark, tmp_path):
    stream = (
        spark.readStream.format("postings_gen")
        .option("rowsPerBatch", 50)
        .load()
    )
    assert stream.isStreaming
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(sink).count()
            except Exception:
                n = 0
            if n >= 100:
                break
            time.sleep(1)
    finally:
        q.stop()
    out = spark.read.parquet(sink)
    n = out.count()
    assert n >= 100 and n % 50 == 0  # whole micro-batches only
    # offset ranges replay deterministically: row i is always _row(i)
    first = out.filter(F.col("job_title") == "Python Developer #0").count()
    assert first == 1
