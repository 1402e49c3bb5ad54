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
                 order_col: str, out_col: str = "instance_num") -> DataFrame:
    """Distinguish repeated (patient, concept) observations per entity.

    Reference [ext-contract]: a patient with 2 diagnoses produces 2
    ``Diagnosis.tumor_type`` observations that must carry distinct
    instance numbers (diagnosis.csv: 19 diagnoses over 17 individuals).
    """
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    return obs.withColumn(out_col, F.row_number().over(w))


def surrogate_key(df: DataFrame, order_col: str,
                  out_col: str = "sk") -> DataFrame:
    """Stable dense integer ids ordered by a natural key.

    Reference [ext-contract]: i2b2 load needs integer patient_num /
    instance ids (README.md:177-179). A global (unpartitioned) window is
    a single-reducer bottleneck at scale — fine for bounded dimensions
    (patients); for unbounded fact tables prefer
    ``zipWithIndex``-style per-partition offsets or monotonically
    increasing ids when density is not required.
    """
    w = Window.orderBy(order_col)
    return df.withColumn(out_col, F.row_number().over(w))


def topk_per_group(df: DataFrame, group_cols: Sequence[str],
                   order_by: Sequence, k: int) -> DataFrame:
    """Top-k rows per group with a total order (deterministic ties)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))
