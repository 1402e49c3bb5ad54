"""Window operators (SURVEY.md §2.5).

Windows are explicit about ordering so results are deterministic under
parallelism (SURVEY §7.4 risk 4): every ranking window orders by a full
key, never relying on input order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def instance_num(obs: DataFrame, partition_cols: Sequence[str],
                 order_col, out_col: str = "instance_num") -> DataFrame:
    """Distinguish repeated (patient, concept) observations per entity.

    Reference [ext-contract]: a patient with 2 diagnoses produces 2
    ``Diagnosis.tumor_type`` observations that must carry distinct
    instance numbers (diagnosis.csv: 19 diagnoses over 17 individuals).

    ``order_col`` may be a single column name or a sequence of them —
    callers should pass enough columns to break every tie, or accept
    that identically-valued rows get interchangeable numbers.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return obs.withColumn(out_col, F.row_number().over(w))


def surrogate_key(df: DataFrame, order_col: str,
                  out_col: str = "sk") -> DataFrame:
    """Stable dense integer ids ordered by a natural key.

    Reference [ext-contract]: i2b2 load needs integer patient_num /
    instance ids (README.md:177-179). A global (unpartitioned) window is
    a single-reducer bottleneck at scale — fine for bounded dimensions
    (patients); :func:`surrogate_key_distributed` is the same contract
    without the single-partition sort.
    """
    w = Window.orderBy(order_col)
    return df.withColumn(out_col, F.row_number().over(w))


def surrogate_key_distributed(df: DataFrame, order_col: str,
                              out_col: str = "sk",
                              buckets: int = 1 << 10) -> DataFrame:
    """Scale-safe dense global row numbers: two-phase range bucketing.

    Phase 1 range-partitions rows into ``buckets`` by the order key and
    numbers rows *within* each bucket (parallel windows). Phase 2
    computes per-bucket counts — a tiny aggregate (``buckets`` rows) —
    turns them into running offsets with a window over that small frame,
    and broadcast-joins the offsets back. No stage ever sorts the whole
    table in one partition, unlike ``row_number() OVER (ORDER BY ...)``.

    The bucket id comes from ``ntile``-free range math: we use a
    repartitionByRange + spark_partition_id, which preserves global
    order across buckets (range partitioner boundaries are sampled but
    the *assignment* is order-correct, which is all density needs).
    Same observable output as :func:`surrogate_key` for a unique
    ``order_col``.
    """
    ranged = (df.repartitionByRange(buckets, F.col(order_col))
              .withColumn("__bucket", F.spark_partition_id()))
    w_in = Window.partitionBy("__bucket").orderBy(order_col)
    numbered = ranged.withColumn("__rn", F.row_number().over(w_in))
    counts = numbered.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    w_off = (Window.orderBy("__bucket")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "__offset", F.coalesce(F.sum("__n").over(w_off), F.lit(0)))
    return (numbered.join(F.broadcast(offsets.select("__bucket", "__offset")),
                          "__bucket")
            .withColumn(out_col, (F.col("__offset") + F.col("__rn"))
                        .cast("int"))
            .drop("__bucket", "__rn", "__offset"))


def topk_per_group(df: DataFrame, group_cols: Sequence[str],
                   order_by: Sequence, k: int) -> DataFrame:
    """Top-k rows per group with a total order (deterministic ties)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))
