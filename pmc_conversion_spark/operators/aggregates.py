"""Aggregation operators (SURVEY.md §2.4).

All aggregations are map-side-partial by construction (Spark hash
aggregate); nothing here collects to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def manifest_digest(manifest: DataFrame) -> DataFrame:
    """Order-insensitive content fingerprint of a directory manifest.

    Reference: luigi-pipeline/main.py:66-68 — done-signal content is the
    newline-joined ``"<path> <sha1>"`` lines sorted by path. Implemented
    as collect_list + array_sort so the result is deterministic under any
    partitioning (SURVEY §7.4 risk 4).

    Output: single row DataFrame[digest: string].
    """
    return (manifest
            .select(F.concat_ws(" ", "path", "sha1").alias("line"))
            .agg(F.concat_ws("\n", F.array_sort(F.collect_list("line")))
                 .alias("digest")))


def set_equality(a: DataFrame, b: DataFrame) -> DataFrame:
    """Two manifests are "in sync" iff their row multisets are equal.

    Reference: scripts/sync.py:121-122,177-180 (re-verified after copy).
    Output: single row DataFrame[in_sync: boolean] computed via symmetric
    exceptAll counts (no driver-side set materialization).
    """
    from pmc_conversion_spark.util import local_df
    only_a = a.exceptAll(b).count()
    only_b = b.exceptAll(a).count()
    spark = a.sparkSession
    return local_df(spark, [(only_a == 0 and only_b == 0,)],
                    "in_sync boolean")


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Primary-key validation: key tuples appearing more than once.

    Reference: entity ids must be unique before the priority merge
    [ext-contract, sources_config.json id attributes]. Callers assert
    empty (error path, not silent dedup).
    """
    return (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1))


def obs_stats(obs: DataFrame, concept_col: str = "concept_cd",
              num_col: str = "nval_num") -> DataFrame:
    """Per-concept observation statistics (count / min / max / avg).

    The post-load query surface tranSMART serves (README.md:177-179) —
    our engine answers it directly from the observations DataFrame.
    """
    return (obs.groupBy(concept_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.min(num_col).alias("min_val"),
        F.max(num_col).alias("max_val"),
        F.avg(num_col).alias("avg_val")))
