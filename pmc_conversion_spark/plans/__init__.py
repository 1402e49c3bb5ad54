"""Config-driven pipeline plans: sources->CSR priority merge, codebook
decode, EAV unpivot, ontology tree, incremental snapshot layer, DAG
runner — the reference's five-stage dataflow re-expressed as DataFrame
plans (SURVEY.md §0, §3)."""
