"""Source/sink round-trips (S5-S9)."""

from __future__ import annotations

import glob
import json

from big_data_spark.fixtures import JOBS_COLUMNS, JOBS_CORPUS, jobs_corpus_df
from big_data_spark.schemas import JOB_POSTING_RAW_SCHEMA
from big_data_spark.sources import (
    read_csv,
    read_json,
    write_csv_single,
    write_parquet,
)


def test_csv_roundtrip_with_malformed_rows(spark, tmp_path):
    src = tmp_path / "in.csv"
    header = ",".join(JOB_POSTING_RAW_SCHEMA.fieldNames())
    lines = [header]
    lines.append('"T1","full","Junior","HCM","2 năm","a,b","IT","10tr",0.0,0.0,"tr","2024-01-01 00:00:00","J"')
    # malformed numeric cell -> permissive null, row survives
    lines.append('"T2","full","Junior","HN","3+","x,y","IT","5tr",notanumber,0.0,"tr","2024-01-01 00:00:00","J"')
    src.write_text("\n".join(lines))
    df = read_csv(spark, str(src), JOB_POSTING_RAW_SCHEMA)
    rows = {r["job_title"]: r for r in df.collect()}
    assert rows["T1"]["salary_min"] == 0.0
    assert rows["T2"]["salary_min"] is None  # permissive null, not an error


def test_json_reader_schema_contract(spark, tmp_path):
    src = tmp_path / "in.json"
    with open(src, "w") as f:
        for row in JOBS_CORPUS[:5]:
            f.write(json.dumps(dict(zip(JOBS_COLUMNS, row))) + "\n")
    df = read_json(spark, str(src), JOB_POSTING_RAW_SCHEMA)
    assert df.count() == 5
    assert df.schema == JOB_POSTING_RAW_SCHEMA


def test_partitioned_parquet_write_and_pruning(spark, tmp_path):
    df = jobs_corpus_df(spark).na.fill({"city": "Unknown"})
    out = str(tmp_path / "by_city")
    write_parquet(df, out, partition_by=["city"])
    dirs = {p.split("=")[-1] for p in glob.glob(f"{out}/city=*")}
    assert "Unknown" in dirs and len(dirs) >= 3
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    # partition filter prunes to a single directory's files
    one = back.filter(back.city == "HCM")
    from big_data_spark.plans import formatted_plan

    assert one.count() == df.filter(df.city == "HCM").count()
    assert "PartitionFilters: [isnotnull(city" in formatted_plan(one)


def test_append_mode_accumulates(spark, tmp_path):
    df = jobs_corpus_df(spark)
    out = str(tmp_path / "acc")
    write_parquet(df, out, mode="overwrite")
    write_parquet(df, out, mode="append")
    assert spark.read.parquet(out).count() == 2 * df.count()


def test_csv_single_file_export(spark, tmp_path):
    df = jobs_corpus_df(spark).limit(10)
    out = str(tmp_path / "export")
    write_csv_single(df, out)
    parts = glob.glob(f"{out}/part-*.csv")
    assert len(parts) == 1  # coalesce(1): exactly one part file (S9)
    assert open(parts[0]).readline().startswith("job_title")


def test_write_parquet_target_file_rows(spark, tmp_path):
    """maxRecordsPerFile splits output without re-evaluating the plan
    (the old count()-based repartition ran the input twice)."""
    import glob

    from big_data_spark.sources.io import write_parquet

    df = spark.range(1000).coalesce(1)
    out = str(tmp_path / "sized")
    write_parquet(df, out, target_file_rows=100)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 10  # 1000 rows / 100-row cap
    assert spark.read.parquet(out).count() == 1000
