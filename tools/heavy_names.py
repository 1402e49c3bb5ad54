"""Print the HEAVY-FAMILY query names, one line of space-separated
names — the sf0.1 gate population (r5 verdict task #2; r7 verdict
task #4 made the list PLAN-DERIVED instead of curated).

The sf0.01 gate cannot exercise size-dependent behavior: AQE stage
re-planning (the r6 bucket-consistency bug in agg_ks_test surfaced
ONLY at sf0.1), hot-bucket caps, packing radix guards, broadcast
thresholds, skew splits. The r6 bug class — physical-plan-dependent
state shared across plan branches — lives in exactly the ops that
COMPOSE two-phase helpers, convergence loops, or Python-worker
stages, so membership is now derived from each registered query's
EXECUTED PLAN (built at sf0.001 — plan structure is sf-independent)
rather than a hand-kept list:

- ``__bucket``                → two-phase range-bucketed helper frame
- ``ExistingRDD``             → localCheckpoint (convergence loops,
                                reused-narrow-frame materialization)
- ``InPandas`` / ``ArrowEval`` / ``MapInArrow`` / ``EvalPython`` /
  ``PythonUDTF``              → Arrow/Python worker stages
- ``TransformWithState``      → typed-state streaming

plus the heavy PREFIX families (plan cost scales with corpus
pair/cluster structure) and the named EXTRA ops with size-dependent
guards the plan string cannot show (broadcast thresholds, radix
guards, sample caps).

Usage:
    python -u tools/heavy_names.py            # derive + print
    CHECK_SF_DIR=/root/testdata/sf0.1 \\
        python -u tools/check_oracle.py $(python tools/heavy_names.py) \\
        > FULLGATE_sf0.1_r<N>.log
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DERIVE_SF_DIR = os.environ.get("HEAVY_DERIVE_SF_DIR",
                               "/root/testdata/sf0.001")

PREFIXES = ("dedup_", "sim_", "graph_", "pack_", "pipeline_", "win_")

#: plan-string markers for the r6 bug class: two-phase helper frames,
#: checkpointed loops, and Python-worker stages
PLAN_MARKERS = ("__bucket", "ExistingRDD", "InPandas", "ArrowEval",
                "MapInArrow", "EvalPython", "PythonUDTF",
                "TransformWithState")

#: ops with size-dependent guards invisible in the plan STRING
#: (broadcast thresholds, hot-bucket caps, radix guards, sample caps)
EXTRA = {
    "agg_gains_table", "agg_uplift_qini", "agg_spearman_rank_corr",
    "dq_missing_ranges", "transmart_observation_fact",
    "transmart_patient_dimension", "split_leakage_safe",
    "split_train_val_test", "split_kfold_assign",
    "mm_image_neardup_ahash", "mm_audio_neardup_energy",
    "mm_image_dedup_cluster", "text_bm25_topk", "text_tfidf_topk",
    "text_cooccurrence_pmi", "text_rake_keywords", "agg_ks_test",
    "agg_exact_kth_element", "dq_auc_score", "sample_poisson_bootstrap",
    "sketch_ams_f2", "vocab_bpe_merge_step", "ts_holt_winters",
    "agg_markov_stationary", "agg_logreg_irls", "join_cogroup_arrow",
    "join_geo_grid_radius", "f_jaro_winkler",
}


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def heavy_names(derive: bool = True) -> list[str]:
    """Union of prefix families, EXTRA, and (with ``derive``)
    plan-marker-derived names. Derivation builds every registered
    query at sf0.001 (~10 min; streaming builders run their
    availableNow batch) — run once per round to produce the gate
    population."""
    from pmc_conversion_spark.session import get_spark

    import __spark_entry__ as E
    qs = E.queries()
    names = {n for n in qs if n.startswith(PREFIXES)} | (EXTRA & set(qs))
    if derive:
        spark = get_spark("heavy-derive")
        spark.sparkContext.setLogLevel("ERROR")
        for n in sorted(qs):
            if n in names:
                continue
            try:
                plan = _plan_of(qs[n](spark, DERIVE_SF_DIR))
            except Exception:
                # build failures are the correctness gate's business
                continue
            if any(m in plan for m in PLAN_MARKERS):
                names.add(n)
    return sorted(names)


if __name__ == "__main__":
    derive = "--static" not in sys.argv
    print(" ".join(heavy_names(derive=derive)))
