"""Source/sink round-trips (S5-S9)."""

from __future__ import annotations

import glob
import json

from big_data_spark.fixtures import JOBS_COLUMNS, JOBS_CORPUS, jobs_corpus_df
from big_data_spark.schemas import JOB_POSTING_RAW_SCHEMA
from big_data_spark.sources import (
    read_csv,
    read_json,
    read_orc,
    write_csv_single,
    write_orc,
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


def test_orc_roundtrip_partitioned_with_pushdown(spark, tmp_path):
    """ORC sink/source: partitioned write prunes on read, value
    filters push down to the ORC scan, and the roundtrip is exact."""
    df = jobs_corpus_df(spark).na.fill({"city": "Unknown"})
    out = str(tmp_path / "orc_by_city")
    write_orc(df, out, partition_by=["city"])
    dirs = {p.split("=")[-1] for p in glob.glob(f"{out}/city=*")}
    assert len(dirs) >= 3
    back = read_orc(spark, out)
    assert back.count() == df.count()
    one = back.filter(back.city == "HCM").filter(back.salary.isNotNull())
    from big_data_spark.plans import formatted_plan

    plan = formatted_plan(one)
    assert "PartitionFilters: [isnotnull(city" in plan
    assert "PushedFilters: [IsNotNull(salary" in plan
    assert one.count() == df.filter(
        (df.city == "HCM") & df.salary.isNotNull()
    ).count()


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


def test_observe_metrics_on_etl_chain(spark):
    """df.observe: pipeline health metrics collected DURING the job
    (no second pass) — the idiomatic replacement for separate
    count()/agg() monitoring queries at 100 TB."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from big_data_spark.fixtures import synthetic_postings
    from big_data_spark.operators.job_etl import clean_job_postings

    obs = Observation("etl_health")
    clean = clean_job_postings(
        synthetic_postings(spark, 500), deterministic_id=True
    ).observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("salary_avg").isNull().cast("long")).alias("null_salary"),
        F.avg("exp_avg_year").alias("avg_exp"),
    )
    n = clean.count()
    got = obs.get
    assert got["rows"] == n == 500
    assert 0 <= got["null_salary"] <= n
    assert got["avg_exp"] is None or got["avg_exp"] >= 0


def test_freq_items_heavy_hitters(spark):
    """stat.freqItems: the heavy-hitters sketch (one pass, bounded
    memory) — support 1% must surface every token whose true share
    exceeds it; verified against exact counts."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    tok = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    )
    n = tok.count()
    [freq] = tok.stat.freqItems(["token"], support=0.01).collect()
    surfaced = set(freq["token_freqItems"])
    exact_heavy = {
        r["token"]
        for r in tok.groupBy("token")
        .count()
        .filter(F.col("count") > n * 0.01)
        .collect()
    }
    # sketch guarantee: no false negatives above the support threshold
    assert exact_heavy <= surfaced, exact_heavy - surfaced


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from big_data_spark.sources import compact_parquet

    out = str(tmp_path / "many_files")
    df = jobs_corpus_df(spark)
    df.repartition(16).write.parquet(out)
    before = glob.glob(f"{out}/part-*.parquet")
    assert len(before) > 4  # empty partitions write no file
    rows_before = sorted(map(tuple, spark.read.parquet(out).collect()), key=repr)

    n = compact_parquet(spark, out, target_files=2)
    after = glob.glob(f"{out}/part-*.parquet")
    assert n == len(after) <= 2
    rows_after = sorted(map(tuple, spark.read.parquet(out).collect()), key=repr)
    assert rows_after == rows_before
    # no stray temp/backup dirs left behind
    assert not glob.glob(f"{out}__compact_*")


def test_catalog_normalizes_timestamp_generations(spark):
    """load_table must present session-tz TimestampType regardless of
    the physical parquet generation (timestamp[ns]-as-long vs
    timestamp[us]/NTZ) — downstream schemas and the external gate's
    schema compare depend on it."""
    from big_data_spark.catalog import load_table

    from .conftest import SF_SMOKE

    for table, col in (("events", "ts"), ("orders", "o_orderdate"), ("lineitem", "l_shipdate")):
        dt = dict(load_table(spark, SF_SMOKE, table).dtypes)[col]
        assert dt == "timestamp", (table, col, dt)


def test_dynamic_partition_pruning_from_joined_dim(spark, tmp_path):
    """The 100-TB fact-table contract: when the partition key is only
    constrained THROUGH a join (no literal filter on the fact), Spark
    must inject a runtime dynamicpruning subquery into the fact scan's
    PartitionFilters — reading only the partitions the filtered dim
    selects, instead of the whole table."""
    from pyspark.sql import functions as F

    from big_data_spark.plans import formatted_plan

    fact = spark.range(2000).select(
        F.col("id"),
        (F.col("id") % 10).alias("part_key"),
        (F.col("id") * 2).alias("val"),
    )
    out = str(tmp_path / "fact_parted")
    write_parquet(fact, out, partition_by=["part_key"])
    back = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [(1, "keep"), (3, "keep"), (5, "drop")],
        "part_key bigint, tag string",
    )
    # DPP requires a selective predicate on the dim side — that filter
    # is what the runtime subquery propagates into the fact scan
    joined = back.join(dim.filter(F.col("tag") == "keep"), "part_key")
    plan = formatted_plan(joined)
    assert "dynamicpruningexpression" in plan, plan
    assert joined.count() == 400
