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
                                    DataSourceStreamReader,
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


# ---------------------------------------------------------------------------
# Streaming half of the Python DataSource API: a bounded synthetic
# ticker. Offsets are dict payloads managed by the engine; each
# micro-batch covers [start, end) rows. The generator is finite
# (TICKER_ROWS), so an availableNow-style run drains it in a bounded
# number of batches — which is what makes the stream value-oracle-able.
# ---------------------------------------------------------------------------

TICKER_ROWS = 5_000
TICKER_BATCH = 1_000


class SyntheticTickerDataSource(DataSource):
    """spark.readStream.format("synthetic_ticker")."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_ticker"

    def schema(self) -> str:
        return "id long, bucket long, score double"

    def streamReader(self, schema) -> "SyntheticTickerStreamReader":
        return SyntheticTickerStreamReader()


class SyntheticTickerStreamReader(DataSourceStreamReader):
    """DataSourceStreamReader contract: offset planning on the driver,
    per-partition row iterators on executors (Arrow-batched)."""

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        # the full bounded range is available at once, so a single
        # micro-batch (availableNow included) drains the source —
        # that bounded drain is what makes the stream value-oracle-able
        return {"pos": TICKER_ROWS}

    def partitions(self, start, end):
        lo, hi = start["pos"], end["pos"]
        step = max(1, (hi - lo + 3) // 4)
        return [InputPartition((i, min(i + step, hi)))
                for i in range(lo, hi, step)]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i, i % 7, round((i * 37 % 1000) / 1000.0, 6))

    def commit(self, end):
        pass

    def stop(self):
        pass


def register_ticker_source(spark) -> None:
    spark.dataSource.register(SyntheticTickerDataSource)
