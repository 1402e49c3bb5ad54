"""Bucketed tables: pre-shuffled storage for shuffle-free co-located
joins.

At 100 TB the dominant join cost is shuffling the fact tables onto the
join key for every query. Spark's bucketing writes that shuffle ONCE at
ingest: ``bucketBy(n, key)`` hash-partitions files on disk and records
the bucket spec in the catalog, so every later equi-join or aggregation
on the key reads co-located buckets with NO Exchange in the plan
(asserted in tests/test_plan_quality.py). This is the standing answer
to "is there a shuffle here that becomes the bottleneck at scale" for
keys that are joined repeatedly — individual_id in the reference's CSR
model, custkey/user_id in the test corpus.

Bucketed output requires the table catalog (``saveAsTable``) — a plain
``save(path)`` cannot record the bucket spec. The default in-memory
catalog is enough; no Hive metastore needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, *,
                   buckets: int = 8, path: str | None = None,
                   sort: bool = True) -> None:
    """(Re)write ``df`` as a bucketed, optionally sort-within-bucket
    parquet table. Sorting by the key lets sort-merge joins skip their
    Sort too."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the bucket spec only applies through the table
    identity, not a raw parquet path scan."""
    return spark.table(table)
