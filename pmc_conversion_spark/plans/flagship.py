"""Flagship end-to-end slice (SURVEY.md §7.2) on the driver star schema.

Shape mirrors the reference's minimum pipeline: read two sources, derive
attributes, FK-join, EAV-unpivot with instance numbering, aggregate
per-concept stats — i.e. sources2csr + csr2transmart + the post-load
query surface in one plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pmc_conversion_spark import tables
from pmc_conversion_spark.plans.eav import unpivot_to_eav


def flagship_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⨝ orders -> EAV observations -> per-concept stats."""
    customer = tables.load(spark, sf_dir, "customer")
    orders = tables.load(spark, sf_dir, "orders")

    # "sources2csr": one row per order with patient-style attributes.
    entity = (orders.join(F.broadcast(customer),
                          orders.o_custkey == customer.c_custkey)
              .select(
                  F.col("c_custkey").alias("patient_id"),
                  F.col("o_orderkey").alias("entity_id"),
                  F.col("o_totalprice").alias("total_price"),
                  F.col("o_orderstatus").alias("order_status"),
                  F.col("c_mktsegment").alias("segment"),
                  F.col("o_orderdate").cast("date").alias("order_date")))

    obs = unpivot_to_eav(
        entity, entity="Order", key="patient_id",
        attrs={"total_price": "numeric", "order_status": "text",
               "segment": "text", "order_date": "date"},
        extra_keys=["entity_id"])

    return (obs.groupBy("concept_cd")
            .agg(F.count(F.lit(1)).alias("n_obs"),
                 F.countDistinct("patient_id").alias("n_patients"),
                 F.max("instance_num").alias("max_instance"),
                 F.min("nval_num").alias("min_val"),
                 F.max("nval_num").alias("max_val"))
            .orderBy("concept_cd"))
