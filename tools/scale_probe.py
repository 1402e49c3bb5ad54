"""Generate SCALING.md: measured scale-up behavior of the heavy
operators across the three driver scale factors.

The 100 TB claim is a plan-shape argument (PLANS.md) — this tool adds
the MEASUREMENT: if an operator's runtime grows ~10× when the data
grows 10× (sf0.01 → sf0.1), its cost is linear in the input and the
plan-shape argument holds; a ratio near 100 would expose a hidden
quadratic (all-pairs, unbounded window) no matter what the plan
claims. Times are min-of-N on a steal-prone VM (same policy as
bench.py); the sf0.001 column is reported but NOT used for the
verdict — at that size fixed job overhead (~0.1-0.5 s) dominates and
flattens every ratio.

Usage: python -u tools/scale_probe.py   (rewrites SCALING.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]
REPEATS = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))

#: heavy / risk-class representatives: one per family whose cost could
#: plausibly hide a superlinear term (pair generation, clustering,
#: windows, global ranks, graph wedges, matmul blocks)
PROBED = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_cluster_cc",
    "dedup_embedding_cosine_blocked",
    "sim_knn_join",
    "text_tfidf_topk",
    "text_cooccurrence_pmi",
    "graph_triangle_count",
    "ts_interval_union",
    "pipeline_corpus_mix",
    "pipeline_curriculum_order",
    "transmart_observation_fact",
    "agg_grouping_sets",
    "win_frame_range_time",
    "split_leakage_safe",
    "dedup_minhash_cluster",
    "dedup_semantic_cluster",
    "sim_pq_encode",
    "mm_audio_frame_energy",
    "pipeline_incremental_dedup",
    "agg_markov_transitions",
    "pipeline_rejection_sampling",
    "graph_pagerank",
    "mm_decode_real",
    "text_zipf_fit",
    "vocab_coverage_curve",
    "dedup_minhash_bbit",
    # r9 (verdict #1 'Done' criterion): the bare two-phase surrogate
    # key under the size-scaled bucket rule — ratio must stay ≈linear
    # (win_anchored_vwap / fisher / cvm are already probed below)
    "win_surrogate_key_distributed",
    # r9: the two new real codecs (linear in documents)
    "mm_decode_real_jpeg_color",
    "mm_decode_real_png_palette",
    "mm_decode_real_gif89a",
    "mm_decode_real_png_adam7",
    "mm_decode_real_jpeg_progressive",
    "sketch_tdigest_batch",
    "join_geo_grid_radius",
    "pack_length_bucketing_eval",
    "dedup_cross_source_matrix",
    "text_boilerplate_strip",
    "graph_label_propagation",
    "agg_ks_test",
    "text_bm25_topk",
    "agg_ndcg_eval",
    "join_cogroup_arrow",
    "agg_ab_sprt",
    "sql_product_profit",
    "sql_waiting_suppliers",
    "pipeline_e2e_llm_capstone",
    "graph_kcore",
    "ts_seasonal_decompose",
    "mm_image_dedup_cluster",
    "ts_linear_interpolate",
    "agg_covisitation_topk",
    "dedup_method_agreement",
    "pipeline_contrastive_triplets",
    # r4 verdict task #5 completions
    "sim_ivf_recall_eval",
    "mm_image_neardup_ahash",
    # r5: the de-serialized two-phase ntile/rank plans and the new
    # heavy families (full-rank selection, token-explode sketch,
    # wedge-join link prediction, gaps/islands two-phase lead)
    "agg_gains_table",
    "agg_exact_kth_element",
    "sketch_ams_f2",
    "graph_link_prediction",
    "win_gaps_islands",
    "dq_missing_ranges",
    "sample_poisson_bootstrap",
    "ts_holt_winters",
    # r5 wave 2: iterative HITS, the DSIR token-scoring pass, RAKE's
    # double token scan + per-doc windows, the pandas-UDF jaro-winkler
    # (bounded pair domain — its time should be FLAT in sf), and the
    # regex sequence encoder
    "graph_hits",
    "pipeline_dsir_select",
    "text_rake_keywords",
    "f_jaro_winkler",
    "agg_seq_pattern_count",
    "ts_ses_alpha_sweep",
    # r5 wave 3: one-scan 16-replicate randomization test (should be
    # ~flat vs plain agg), and the state-bounded eigenvector whose
    # iteration cost must NOT grow with data
    "agg_permutation_test",
    "agg_markov_stationary",
    # r6: convergence-loop capstones — per-round localCheckpoint must
    # keep total cost ∝ rounds × data, so the sf ratio stays linear
    # even though the ROUND COUNT is data-dependent
    "graph_pagerank_converged",
    "sim_kmeans_lloyd",
    # r7: the seeded-Lloyd composition (two loops chained — cost must
    # stay rounds × data), the continuous-domain two-phase rank test,
    # the bounded-grid pair collapse (should be ~flat in sf), and the
    # broadcast-centroid silhouette
    "sim_kmeans_pp_lloyd",
    "agg_kruskal_wallis",
    "agg_kendall_tau_b",
    "sim_silhouette_simplified",
    # r7 wave 2: the in-plan EM loop (fixed 8 rounds over a BOUNDED
    # histogram — should be ~flat in sf), the data-derived
    # log-factorial Fisher tail (lf frame grows with the corpus —
    # linear), the two-prefix-sum CvM rank test (linear), the
    # compressed-codec decode (linear in documents), and the
    # distinct-word WordPiece tokenizer (sublinear once the word
    # domain saturates)
    "agg_gmm_em_converged",
    "agg_fisher_exact",
    "agg_cvm_test",
    "mm_decode_real_rle8",
    "vocab_wordpiece_longest_match",
    # r7 wave 3+: the date-span all-pairs frames (matrix profile,
    # sample entropy — pair count is CALENDAR-bounded, so time should
    # be ~flat in sf while the day-grouped scan grows linearly), the
    # per-key DTW DP (flat — 52-week profiles), the sub-vector
    # late-interaction scorer (linear in candidates), the two word/
    # supplier-graph power iterations (rounds × edges), and the
    # interval-semi-join CEP chain (linear in per-user events)
    "ts_matrix_profile",
    "ts_sample_entropy",
    "ts_dtw_distance",
    "sim_maxsim_multivector",
    "graph_eigencentrality_power",
    "text_keyphrase_textrank",
    "stream_cep_followed_by",
    # r8: the grouped two-phase anchored VWAP (verdict #3 asks for a
    # SCALING row proving the bucketed rewrite's sf growth — linear),
    # the two real-JPEG Arrow stages (linear in documents), the
    # calendar-bounded Hoeffding pair frame (~flat), the grid-prefix
    # survival concordance (linear scan, constant join), the token
    # spectrum and dispersion text statistics (linear), and the
    # interval anti-join CEP negation (linear in per-user events)
    "win_anchored_vwap",
    "mm_decode_real_jpeg",
    "mm_jpeg_entropy_size",
    "agg_hoeffding_d",
    "agg_harrell_cindex",
    "text_yule_k",
    "text_gries_dp",
    "stream_cep_negation",
]

#: data grows 10x from sf0.01 to sf0.1; flag anything growing much
#: faster than the data (2x headroom for shuffle constants and cache
#: effects before we call it superlinear)
SUPERLINEAR_RATIO = 20.0

#: Everything at/below this marker in SCALING.md is hand-authored
#: one-time analysis and survives regeneration verbatim.
HAND_MARKER = "<!-- hand-authored appendix: preserved by scale_probe.py -->"


def probe_incremental_fixed_batch(spark, repeats: int) -> list[str]:
    """Measure pipeline_incremental_dedup's COST CONTRACT directly:
    hold the daily increment fixed (200 docs) and grow the stored base
    corpus 10× (sf0.01 → sf0.1 documents). With stored shingle sets
    (the daily-ingest model) and new-shingle bucket pruning
    (functions/dedup.ngram_jaccard_pairs_from_sets), the timed daily
    run should be ~FLAT in the base size — the measured twin of the
    'scales with the increment, not the corpus' claim."""
    import tempfile
    import time as _t

    from pyspark.sql import functions as F

    from pmc_conversion_spark.functions.dedup import (
        _hashed_shingle_sets, ngram_jaccard_pairs_from_sets)

    lines = [
        "",
        "## Increment-fixed probe: pipeline_incremental_dedup",
        "",
        "Base corpus grows 10× while the daily increment stays at 200",
        "docs; base shingle sets are PRECOMPUTED to parquet (untimed —",
        "the ingest-time cost a daily pipeline pays once). The timed",
        "daily run = shingle the increment + bucket-prune against the",
        "stored sets + emit/verify pairs. Flat time across the rows is",
        "the cost contract: daily cost ∝ increment, not corpus.",
        "",
        "| base | base docs | timed daily run (s) |",
        "|---|---|---|",
    ]
    # fixed increment: 200 docs from sf0.001, ids offset past any base
    OFFSET = 10_000_000
    inc = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
           .filter(F.col("doc_id") < 200)
           .select((F.col("doc_id") + OFFSET).alias("doc_id"), "text"))
    for sf, label in [("/root/testdata/sf0.01", "sf0.01"),
                      ("/root/testdata/sf0.1", "sf0.1")]:
        base = spark.read.parquet(f"{sf}/documents.parquet").select(
            "doc_id", "text")
        n_base = base.count()
        stored = tempfile.mkdtemp(prefix="incr_sets_")
        _hashed_shingle_sets(base, "doc_id", "text", 3) \
            .write.mode("overwrite").parquet(stored)
        best = None
        for _ in range(repeats):
            t0 = _t.time()
            sets = (spark.read.parquet(stored)
                    .unionByName(_hashed_shingle_sets(inc, "doc_id",
                                                      "text", 3)))
            ngram_jaccard_pairs_from_sets(sets, new_min_id=OFFSET).count()
            dt = _t.time() - t0
            best = dt if best is None else min(best, dt)
        lines.append(f"| {label} | {n_base} | {best:.3f} |")
        print(f"incremental-fixed {label}: base={n_base} t={best:.3f}s",
              flush=True)
    lines.append("")
    return lines


def probe_tws_pricing(spark, repeats: int) -> list[str]:
    """Price the Spark-4 state machinery (r6 verdict task #7): the
    SAME aggregation — per-user event count — three ways, so the
    fixed-vs-variable cost split of each stateful API is on record
    before anyone reaches for it at scale. transformWithStateInPandas
    (RocksDB provider + state-server protobuf round-trips) and
    applyInPandasWithState (Arrow group iteration, default provider)
    both pay a per-query streaming-machinery floor that the batch
    groupBy never pays; what matters at scale is that the floor is
    FIXED (per query, per key-partition) while the data-dependent part
    tracks rows."""
    import time as _t

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from pmc_conversion_spark import tables

    qs = E.queries()
    if "stream_running_count_tws" not in qs:
        return ["", "## State-machinery pricing: protobuf unavailable,"
                    " TWS not registered", ""]

    def apws_count(spark, sf_dir):
        # applyInPandasWithState twin of running_count_tws, same
        # streaming harness (availableNow file stream -> memory sink)
        import tempfile
        import uuid

        import pandas as pd
        from pyspark.sql import types as T
        from pyspark.sql.streaming.state import GroupStateTimeout

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        stream = (spark.readStream.schema(raw.schema)
                  .option("pathGlobFilter", "events.parquet")
                  .parquet(sf_dir))

        def fn(key, pdfs, state):
            n = sum(len(p) for p in pdfs)
            total = (state.get[0] if state.exists else 0) + n
            state.update((total,))
            yield pd.DataFrame({"user_id": [key[0]],
                                "n_events": [total]})

        out = (stream.groupBy("user_id").applyInPandasWithState(
            fn, "user_id long, n_events long", "n long",
            "update", GroupStateTimeout.NoTimeout))
        name = f"apws_{uuid.uuid4().hex[:8]}"
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("update")
             .option("checkpointLocation",
                     tempfile.mkdtemp(prefix="pmc_apws_ckpt_"))
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        return (spark.table(name).groupBy("user_id")
                .agg(F.max("n_events").alias("n_events")))

    def batch_count(spark, sf_dir):
        return (tables.load(spark, sf_dir, "events")
                .groupBy("user_id").count())

    approaches = [
        ("transformWithStateInPandas (RocksDB)",
         lambda sf: qs["stream_running_count_tws"](spark, sf)),
        ("applyInPandasWithState (default provider)",
         lambda sf: apws_count(spark, sf)),
        ("batch groupBy().count()",
         lambda sf: batch_count(spark, sf)),
    ]
    lines = [
        "",
        "## State-machinery pricing: per-user running count three ways",
        "",
        "The same aggregation through each stateful API (availableNow",
        "file stream → memory sink) vs the plain batch aggregate. The",
        "streaming APIs pay a fixed per-query machinery floor (state",
        "server spin-up, RocksDB provider, checkpoint dir, protobuf",
        "round-trips for TWS); the near-flat sf0.01 → sf0.1 growth",
        "shows the floor dominates at these sizes — on a real cluster",
        "the floor amortizes over the stream's lifetime while state",
        "partitions by key, so the VARIABLE cost is what scales.",
        "",
        "| approach | sf0.01 (s) | sf0.1 (s) |",
        "|---|---|---|",
    ]
    for label, fn in approaches:
        cells = []
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            best = None
            try:
                for _ in range(repeats):
                    t0 = _t.time()
                    fn(sf).count()
                    dt = _t.time() - t0
                    best = dt if best is None else min(best, dt)
                cells.append("%.3f" % best)
            except Exception as exc:  # noqa: BLE001 - report, don't die
                cells.append("ERR")
                print(f"tws-pricing error {label} @ {sf}: {exc}",
                      flush=True)
        lines.append(f"| {label} | {cells[0]} | {cells[1]} |")
        print(f"tws-pricing {label}: {cells}", flush=True)
    lines.append("")
    return lines


def main() -> None:
    from pmc_conversion_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark("scale-probe")
    qs = E.queries()
    spark.range(1).count()
    n = spark.sparkContext.defaultParallelism
    spark.range(n).repartition(n).mapInPandas(lambda it: it, "id long").count()

    rows = []
    for name in PROBED:
        times = []
        for sf in SFS:
            best = None
            try:
                for _ in range(REPEATS):
                    t0 = time.time()
                    qs[name](spark, sf).count()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
            except Exception as exc:  # noqa: BLE001 - report, don't die
                best = None
                print(f"error {name} @ {sf}: {exc}", flush=True)
            times.append(best)
        ratio = (times[2] / times[1]
                 if times[1] and times[2] and times[1] > 0 else None)
        rows.append((name, times, ratio))
        print(f"probed {name}: {times} ratio={ratio}", flush=True)

    lines = [
        "# SCALING — measured scale-up of the heavy operators",
        "",
        "Generated by `tools/scale_probe.py` (min-of-%d per cell, same"
        % REPEATS,
        "steal-insulation policy as bench.py). Data grows 10× from",
        "sf0.01 to sf0.1; `ratio` is t(sf0.1)/t(sf0.01). A ratio near",
        "(or below) 10 means cost tracks the data — the measured",
        "counterpart of PLANS.md's plan-shape argument. Ratios WELL",
        "below 10 mean the sf0.01 time is still overhead-dominated",
        "(fixed job/stage costs amortizing away), which is the expected",
        "regime for sub-second queries. Anything approaching 100 would",
        "expose a hidden quadratic; the probe flags ratios above "
        f"{SUPERLINEAR_RATIO:.0f}.",
        "",
        "The sf0.001 column is context only: at that size every query",
        "is fixed-overhead-bound and ratios are meaningless.",
        "",
        "| query | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | ratio 0.01→0.1 | verdict |",
        "|---|---|---|---|---|---|",
    ]
    for name, times, ratio in rows:
        cells = ["%.3f" % t if t is not None else "ERR" for t in times]
        if ratio is None:
            verdict = "ERR"
            rs = "—"
        else:
            rs = "%.1f×" % ratio
            verdict = ("**superlinear?**" if ratio > SUPERLINEAR_RATIO
                       else "≈linear or better")
        lines.append(f"| {name} | {cells[0]} | {cells[1]} | {cells[2]} |"
                     f" {rs} | {verdict} |")
    lines.extend(probe_incremental_fixed_batch(spark, REPEATS))
    lines.extend(probe_tws_pricing(spark, REPEATS))
    lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.md")
    # APPEND-SAFETY (r8 verdict What's-wrong #1: a regen deleted the
    # committed minhash-cluster stage breakdown): everything at or
    # below the hand-authored marker in the existing file is one-time
    # analysis, preserved verbatim across regens.
    appendix = []
    if os.path.exists(out):
        with open(out) as f:
            old = f.read()
        if HAND_MARKER in old:
            appendix = [old[old.index(HAND_MARKER):].rstrip(), ""]
    with open(out, "w") as f:
        f.write("\n".join(lines + appendix))
    print("wrote SCALING.md (appendix preserved: %s)"
          % bool(appendix), flush=True)


if __name__ == "__main__":
    main()
