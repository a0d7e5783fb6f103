"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic job-postings generator, batch and streaming.

Parity target: the reference feeds its pipeline from
``real_time_data_simulation.py`` — a driver-side loop pushing ~1
message/s to Kafka. The engine-idiomatic form is a first-class data
source: the batch reader emits a deterministic synthetic corpus
partition-parallel (generation happens ON the executors, scaling with
partitions, never through the driver), and the stream reader exposes
the same rows as an offset-tracked micro-batch source (rate rows per
trigger, replayable from any offset — so checkpoint recovery works
exactly like Kafka's).

Note: the source classes are pickled by module reference, so the
package must be importable on executors (true for repo-rooted runs;
registry queries deliberately do NOT use this source — see the
cloudpickle note in queries.q68).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

POSTINGS_SCHEMA_DDL = (
    "job_title string, city string, experience string, skills string, salary string"
)

_TITLES = ["Python Developer", "Data Engineer", "Sales Executive", "Kế toán viên"]
_CITIES = ["Hồ Chí Minh", "Hà Nội", "Đà Nẵng", "Cần Thơ"]
_EXPERIENCE = ["1 năm", "2-3 năm", "Trên 5 năm", "Không yêu cầu"]
_SKILLS = ["python,sql", "spark,scala,sql", "excel,communication", "java,spring"]
_SALARIES = ["10-15 triệu", "Trên 20 triệu", "Thỏa thuận", "800 - 1200 USD"]


def _row(i: int) -> tuple[str, str, str, str, str]:
    return (
        f"{_TITLES[i % len(_TITLES)]} #{i}",
        _CITIES[i % len(_CITIES)],
        _EXPERIENCE[i % len(_EXPERIENCE)],
        _SKILLS[i % len(_SKILLS)],
        _SALARIES[i % len(_SALARIES)],
    )


class PostingsDataSource(DataSource):
    """``spark.read.format("postings_gen")`` after
    ``spark.dataSource.register(PostingsDataSource)``.

    Options: ``rows`` (total, default 1000), ``numPartitions``
    (default 4).
    """

    @classmethod
    def name(cls) -> str:
        return "postings_gen"

    def schema(self) -> str:
        return POSTINGS_SCHEMA_DDL

    def reader(self, schema) -> "PostingsBatchReader":
        return PostingsBatchReader(self.options)

    def streamReader(self, schema) -> "PostingsStreamReader":
        return PostingsStreamReader(self.options)


class PostingsBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("numpartitions", 4))

    def partitions(self):
        # row ranges, so generation is executor-side and even
        per = -(-self.rows // self.num_partitions)
        return [
            InputPartition((p * per, min((p + 1) * per, self.rows)))
            for p in range(self.num_partitions)
        ]

    def read(self, partition: InputPartition):
        start, end = partition.value
        for i in range(start, end):
            yield _row(i)


class PostingsStreamReader(DataSourceStreamReader):
    """Offset-tracked micro-batch source: each trigger advances the
    offset by ``rowsPerBatch``; any (start, end) range replays the
    same rows, giving exactly-once under checkpoint recovery."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rowsperbatch", 100))
        self._current = 0

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        self._current += self.rows_per_batch
        return {"offset": self._current}

    def partitions(self, start: dict, end: dict):
        return [InputPartition((start["offset"], end["offset"]))]

    def read(self, partition: InputPartition):
        start, end = partition.value
        for i in range(start, end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        pass
