"""Print the designated HEAVY-FAMILY query names, one line of
space-separated names — the sf0.1 gate population (r5 verdict,
next-round task #2).

The sf0.01 gate cannot exercise size-dependent behavior: AQE stage
re-planning (the r6 bucket-consistency bug in agg_ks_test surfaced
ONLY at sf0.1), hot-bucket caps, packing radix guards, broadcast
thresholds, skew splits. Heavy families = everything whose plan scales
with corpus pair/cluster structure (dedup_*, sim_*, graph_*, pack_*,
pipeline_*, win_*) plus named ops with size-dependent guards or
two-phase global orderings.

Usage:
    CHECK_SF_DIR=/root/testdata/sf0.1 \\
        python -u tools/check_oracle.py $(python tools/heavy_names.py) \\
        > FULLGATE_sf0.1_r<N>.log
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PREFIXES = ("dedup_", "sim_", "graph_", "pack_", "pipeline_", "win_")

#: ops outside the heavy prefixes that carry size-dependent guards,
#: two-phase global orderings, pandas-UDF stages, or iteration loops
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


def heavy_names() -> list[str]:
    import __spark_entry__ as E
    names = sorted(E.queries())
    return sorted({n for n in names if n.startswith(PREFIXES)} | EXTRA)


if __name__ == "__main__":
    print(" ".join(heavy_names()))
