"""EAV (entity-attribute-value) unpivot — CSR entities to the i2b2-style
observation long table (SURVEY.md §1.1, stage 3 of the reference
dataflow; concept codes ``<Entity>.<attribute>``, ontology_config.json:
8,12,16).

The unpivot is a single ``stack`` projection (no shuffle); type dispatch
splits values into numeric / text / date observation columns
[ext-contract: the EAV target discriminates exactly these three]; empty
values produce no observation (diagnosis.csv:2 empty cells).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pmc_conversion_spark.operators.windows import instance_num

#: attribute kind -> observation value column
KINDS = ("numeric", "text", "date")


def unpivot_to_eav(df: DataFrame, entity: str, key: str,
                   attrs: Mapping[str, str],
                   extra_keys: Sequence[str] = ()) -> DataFrame:
    """Unpivot entity attributes into observations.

    ``attrs`` maps attribute name -> kind ('numeric'|'text'|'date').
    Output: (``key``, *extra_keys, concept_cd, nval_num, tval_char,
    dval, instance_num) with concept ``<entity>.<attr>``; null/empty
    attribute values are dropped (filter_nonnull_attr semantics).

    instance_num distinguishes repeated (key, concept) observations,
    ordered by the entity row id (``extra_keys``) when present, with the
    observation value columns (tval_char, nval_num, dval) as a
    documented final tiebreak. Without ``extra_keys`` the key alone is
    constant inside the (key, concept) window, so the value columns ARE
    the order — rows identical in every value column are
    interchangeable, which keeps the output multiset deterministic
    under any parallelism/partitioning.
    """
    for a, kind in attrs.items():
        if kind not in KINDS:
            raise ValueError(f"attr {a!r}: unknown kind {kind!r}")
    stack_parts = []
    for a, kind in attrs.items():
        concept = f"{entity}.{a}"
        # try_cast: malformed values -> NULL, never an ANSI error
        nval = F.col(a).try_cast("double") if kind == "numeric" else F.lit(None).cast("double")
        tval = F.col(a).cast("string") if kind == "text" else F.lit(None).cast("string")
        dval = F.col(a).try_cast("date") if kind == "date" else F.lit(None).cast("date")
        raw = F.col(a).cast("string")
        stack_parts.append(
            F.when(raw.isNotNull() & (raw != ""),
                   F.struct(F.lit(concept).alias("concept_cd"),
                            nval.alias("nval_num"),
                            tval.alias("tval_char"),
                            dval.alias("dval"))))
    obs = (df.select(
        F.col(key),
        *[F.col(k) for k in extra_keys],
        F.explode(F.array_compact(F.array(*stack_parts))).alias("o"))
        .select(key, *extra_keys,
                F.col("o.concept_cd").alias("concept_cd"),
                F.col("o.nval_num").alias("nval_num"),
                F.col("o.tval_char").alias("tval_char"),
                F.col("o.dval").alias("dval")))
    # Entity row id first (unique per instance when provided), then the
    # value columns: never a fully-tied ordering, so row_number is
    # deterministic (ADVICE r1: ordering by the partition-constant key
    # alone made instance assignment partitioning-dependent).
    order_cols = [*extra_keys, "tval_char", "nval_num", "dval"]
    return instance_num(obs, [key, "concept_cd"], order_cols)
