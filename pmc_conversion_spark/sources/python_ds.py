"""Custom batch source via the PySpark 4 Python DataSource API.

``SyntheticEventsDataSource`` is a registered ``spark.read.format``
source generating a deterministic integer/bucket/score stream — the
API surface a team reaches for when an in-house feed (message queue,
proprietary file format, internal service) needs to look like any
other DataFrame source: partition planning on the driver, per-partition
Python iterators on the executors (Arrow-batched by the framework),
full predicate/projection handling by Spark above it.

Scale posture: `partitions()` is the parallelism contract — each
InputPartition becomes one Spark task, so a real feed would return one
partition per shard/offset-range. Rows are yielded as plain tuples;
the framework batches them into Arrow, so the per-row Python cost is
amortized the same way mapInPandas is.
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

#: rows per generated partition; fixed so the layout is deterministic
ROWS_PER_PART = 1250
N_PARTS = 8


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events").option("n_parts", k)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id long, bucket long, score double"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(int(self.options.get(
            "n_parts", N_PARTS)))


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, n_parts: int) -> None:
        self.n_parts = n_parts

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        base = partition.value * ROWS_PER_PART
        for i in range(base, base + ROWS_PER_PART):
            yield (i, i % 7, round((i * 37 % 1000) / 1000.0, 6))


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticEventsDataSource)
