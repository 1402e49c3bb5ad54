"""Ontology tree materialization (SURVEY.md §1.1, §2.8 f_path_build).

The reference's ontology_config.json (:2-190) is a nested nodes/children
tree whose leaves bind concept codes; tranSMART renders it as
``\\``-joined c_fullname paths rooted at the configured top node
(luigi.cfg-sample:31 ``top_node=\\Central Subject Registry\\``), with
``01.``-style numeric name prefixes defining display order
(ontology_config.json:4,7,11,15).

The tree is config-sized (plan-time data), so the recursion runs on the
driver and the result becomes a small DataFrame — broadcast-joinable
against the observation table at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SEP = "\\"


def flatten_tree(nodes: list[dict], top_node: str) -> list[dict]:
    """Depth-first flatten of the nested config tree.

    Returns rows (path, name, concept_code, depth, sort_order): paths are
    SEP-joined from the top node; sort_order is the depth-first visit
    position after sorting siblings by name (the ``01.`` prefixes make
    lexicographic order the display order).
    """
    rows: list[dict] = []
    counter = [0]

    def visit(node: dict, prefix: str, depth: int) -> None:
        name = node["name"]
        path = f"{prefix}{SEP}{name}"
        counter[0] += 1
        rows.append({"path": path, "name": name,
                     "concept_code": node.get("concept_code"),
                     "depth": depth, "sort_order": counter[0]})
        for child in sorted(node.get("children", []),
                            key=lambda n: n["name"]):
            visit(child, path, depth + 1)

    root_prefix = top_node.rstrip(SEP)
    for node in sorted(nodes, key=lambda n: n["name"]):
        visit(node, root_prefix, 1)
    return rows


def ontology_df(spark: SparkSession, nodes: list[dict],
                top_node: str) -> DataFrame:
    from pmc_conversion_spark.util import local_df
    return local_df(
        spark, flatten_tree(nodes, top_node),
        "path string, name string, concept_code string, depth int, "
        "sort_order int")


def bind_observations(obs: DataFrame, ontology: DataFrame) -> DataFrame:
    """Attach ontology paths to observations by concept code; the
    ontology side is tiny -> broadcast."""
    from pyspark.sql import functions as F
    leaves = ontology.filter(F.col("concept_code").isNotNull())
    return obs.join(F.broadcast(leaves),
                    obs.concept_cd == leaves.concept_code, "left")
