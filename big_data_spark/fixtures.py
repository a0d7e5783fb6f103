"""Golden string corpora for the parsing operators (FIXTURES.md §7).

One case per branch of the reference's salary/experience logic
(job_streaming.py:70-147), plus adversarial near-misses. These drive
both the pytest golden tests and the oracle-checked q_etl_* queries
(the same rows are rendered as a DuckDB VALUES clause).

Also a deterministic raw-postings generator used by bench.py to
measure ETL-chain throughput at arbitrary row counts without touching
the read-only testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SALARY_CORPUS: list[str] = [
    "10 - 15 triệu",
    "15tr",
    "8m",
    "10.000.000 - 15.000.000",
    "500 - 900 USD",
    "$1,000",
    "Thoả thuận",
    "120",
    "25,5 triệu",
    "Từ 7 triệu",
    "1.200 USD",
    "900",
    "12 triệu - 18 triệu",
    "up to 2,000 usd",
    "99",
    "1000",
    "15.5m",
    "8 - 12tr",
    "Cạnh tranh",
    "20.000.000",
    "300$",
    "55 trieu",
    "7,5 - 9,5 triệu",
    "lương: 30 triệu/tháng",
]

EXPERIENCE_CORPUS: list[str] = [
    "Không yêu cầu kinh nghiệm",
    "Chưa có kinh nghiệm",
    "Mới tốt nghiệp",
    "intern",
    "Internship position",
    "Từ 2 năm",
    "from 3 years",
    "at least 4 years",
    "tối thiểu 1 năm",
    "min 2 yoe",
    "3+",
    "5 năm",
    "2 yoe",
    "10 years experience",
    "3 kn",
    "1 - 3 năm",
    "2-4 years",
    "trên 4 năm",
    "lên đến 10 năm",
    "50 năm",
    "45+",
    "junior level",
    "",
    "số năm: không rõ",
]

CITY_CORPUS: list[str | None] = [
    "Hồ Chí Minh",
    "Hà Nội",
    "HCM",
    "Ha Noi",
    "Đà Nẵng",
    "Bình Dương",
    "",
    None,
]


def values_clause(rows: list, colname: str) -> str:
    """Render a single-column DuckDB VALUES relation (NULL-safe)."""

    def render(v):
        if v is None:
            return "(CAST(NULL AS VARCHAR))"
        return "('" + str(v).replace("'", "''") + "')"

    vals = ", ".join(render(v) for v in rows)
    return f"(VALUES {vals}) AS t({colname})"


def salary_corpus_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(s,) for s in SALARY_CORPUS], ["salary"])


def experience_corpus_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(s,) for s in EXPERIENCE_CORPUS], ["experience"])


def synthetic_postings(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic raw postings at any row count (bench input).

    Generated distributed via ``spark.range`` — no driver-side list,
    so the same generator works for a 10^9-row throughput run.
    """
    sal = F.array(*[F.lit(s) for s in SALARY_CORPUS])
    exp = F.array(*[F.lit(s) for s in EXPERIENCE_CORPUS])
    city = F.array(*[F.lit(s if s else None) for s in CITY_CORPUS])
    i = F.col("id")
    return (
        spark.range(n)
        .withColumn("job_title", F.concat(F.lit("Engineer #"), (i % 5000).cast("string")))
        .withColumn("job_type", F.element_at(F.array(F.lit("Toàn thời gian"), F.lit("Bán thời gian"), F.lit("Thực tập")), (i % 3 + 1).cast("int")))
        .withColumn("position_level", F.element_at(F.array(F.lit("Junior"), F.lit("Senior"), F.lit("Trưởng nhóm"), F.lit("Giám đốc")), (i % 4 + 1).cast("int")))
        .withColumn("city", F.element_at(city, (i % len(CITY_CORPUS) + 1).cast("int")))
        .withColumn("experience", F.element_at(exp, (i % len(EXPERIENCE_CORPUS) + 1).cast("int")))
        .withColumn("skills", F.concat(F.lit("Python, SQL, Skill"), (i % 40).cast("string")))
        .withColumn("job_fields", F.lit("IT - Phần mềm, Data"))
        .withColumn("salary", F.element_at(sal, (i % len(SALARY_CORPUS) + 1).cast("int")))
        .withColumn("salary_min", F.lit(0.0))
        .withColumn("salary_max", F.lit(0.0))
        .withColumn("unit", F.lit("triệu"))
        .withColumn("event_time", F.date_format(F.timestamp_seconds(F.lit(1704067200) + (i % 86400)), "yyyy-MM-dd HH:mm:ss"))
        .withColumn("event_type", F.lit("JOB_CREATED"))
        .drop("id")
    )


# Combined multi-column postings corpus: one row per interesting
# (salary x experience x city x skills) interaction, including a
# null-title row (dropped by the ETL filter) and skill edge cases
# (empty, 1-char tokens, whitespace, duplicate-after-trim).
_SKILLS_VARIANTS = [
    "Python, SQL, Excel",
    "java,,c++",
    " go , rust ",
    "",
    "a, bb",
    "Python",
    "python , PYTHON",
    "data analysis,machine learning",
    "sql,x",
    None,
]

JOBS_CORPUS: list[tuple] = [
    (
        None if i == 7 else f"Job {i}",
        CITY_CORPUS[i % len(CITY_CORPUS)],
        EXPERIENCE_CORPUS[i % len(EXPERIENCE_CORPUS)],
        _SKILLS_VARIANTS[i % len(_SKILLS_VARIANTS)],
        SALARY_CORPUS[i % len(SALARY_CORPUS)],
    )
    for i in range(48)
]

JOBS_COLUMNS = ["job_title", "city", "experience", "skills", "salary"]

# Mixed-script document rows for the tokenizer capstone (q197): the
# Vietnamese jobs corpus flattened to (doc_id, source, text) so it can
# UNION with the parquet `documents` table — doc_ids offset far past
# the table's range; the text join happens HERE (driver-side, static
# data) so both engines consume identical strings instead of each
# replaying NULL-skipping concat semantics.
CAPSTONE_JOBS_DOCS: list[tuple] = [
    (10_000 + i, "jobs", " ".join(v for v in row if v is not None))
    for i, row in enumerate(JOBS_CORPUS)
]


def jobs_corpus_df(spark: SparkSession) -> DataFrame:
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField(c, StringType()) for c in JOBS_COLUMNS])
    return spark.createDataFrame(JOBS_CORPUS, schema)


def multi_values_clause(rows: list[tuple], colnames: list[str]) -> str:
    """Render a multi-column DuckDB VALUES relation (NULL-safe)."""

    def cell(v):
        if v is None:
            return "CAST(NULL AS VARCHAR)"
        # bool is a subclass of int (ADVICE r11): a True cell must not
        # render as CAST(True AS BIGINT)
        if isinstance(v, int) and not isinstance(v, bool):
            return f"CAST({v} AS BIGINT)"
        return "'" + str(v).replace("'", "''") + "'"

    vals = ", ".join("(" + ", ".join(cell(v) for v in r) + ")" for r in rows)
    return f"(VALUES {vals}) AS t({', '.join(colnames)})"
