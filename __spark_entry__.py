"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the flagship smoke query; ``queries()`` /
``oracle_sql()`` expose the engine's operator registry
(pmc_conversion_spark.queries) — one entry per implemented operator from
SURVEY.md §2 plus the LLM-data north-star ops.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY §7.2: the minimum
    end-to-end slice): customer ⨝ orders -> derived attributes -> EAV
    unpivot with instance numbering -> per-concept stats."""
    from pmc_conversion_spark.plans.flagship import flagship_query
    return flagship_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pmc_conversion_spark import queries as Q
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    from pmc_conversion_spark import queries as Q
    return Q.oracles()
