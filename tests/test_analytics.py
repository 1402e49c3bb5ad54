"""Graph analytics, theta sketches, skyline, fuzzy linkage: unit
semantics and scale-shape invariants the DuckDB oracles can't isolate
(orientation correctness on adversarial graphs, estimator error
bounds, dominance law, blocking recall).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pmc_conversion_spark.queries import queries
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _q(name):
    return queries()[name]


# ------------------------------------------------------------- triangles

@pytest.mark.slow
def test_triangle_count_matches_naive_on_known_graph(spark, fixture_df):
    # K4 plus a pendant: C(4,3)=4 triangles; pendant adds none.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    from pmc_conversion_spark.queries import analytics as A
    e = fixture_df(edges, "u bigint, v bigint")
    # replicate the oriented-wedge count on a raw edge DF by reusing
    # the registered query's internals shape: degree-orient, wedge,
    # close. (The registered query is bound to the lineitem fixture;
    # here we exercise the orientation math on an adversarial graph —
    # hub node 4 has max degree and must generate no wedges.)
    deg = (e.select(F.col("u").alias("n"))
           .unionAll(e.select(F.col("v").alias("n")))
           .groupBy("n").agg(F.count(F.lit(1)).alias("d")))
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    keyed = (e.join(du, "u").join(dv, "v")
             .select(F.when((F.col("du") < F.col("dv"))
                            | ((F.col("du") == F.col("dv"))
                               & (F.col("u") < F.col("v"))),
                            F.struct(F.col("u").alias("src"),
                                     F.col("v").alias("dst")))
                     .otherwise(F.struct(F.col("v").alias("src"),
                                         F.col("u").alias("dst")))
                     .alias("o"))
             .select("o.src", "o.dst"))
    e1 = keyed.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = keyed.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = keyed.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    assert e1.join(e2, "b").join(e3, ["a", "c"]).count() == 4


@pytest.mark.slow
def test_triangle_registered_query_consistent(spark):
    row = _q("graph_triangle_count")(spark, SF_DIR).collect()[0]
    assert row.n_nodes > 0 and row.n_edges > 0
    # triangles bounded by C(n_edges over wedges) sanity: every
    # triangle needs 3 edges
    assert row.n_triangles <= row.n_edges * row.n_nodes


# ------------------------------------------------------------- pagerank

@pytest.mark.slow
def test_pagerank_mass_and_determinism(spark):
    out = _q("graph_pagerank")(spark, SF_DIR)
    rows = out.collect()
    n = len(rows)
    total = sum(r.pagerank for r in rows)
    # damped PR over a connected-ish graph: total mass stays near n
    # (exactly n at the fixpoint when every node has outlinks)
    assert abs(total - n) / n < 0.05
    assert all(r.pagerank > 0.14 for r in rows)
    # determinism across partitioning: same values on a repartitioned
    # second run (decimal-summed contributions)
    rows2 = _q("graph_pagerank")(spark, SF_DIR).collect()
    assert {(r.node, r.pagerank) for r in rows} == \
        {(r.node, r.pagerank) for r in rows2}


# ---------------------------------------------------------- theta sketch

def test_theta_estimates_within_kmv_error(spark):
    row = _q("sketch_theta_intersect")(spark, SF_DIR).collect()[0]
    # KMV with k=256: relative standard error ~ 1/sqrt(k-2) ≈ 6.3%;
    # assert 5 sigma. Sets smaller than k are estimated near-exactly.
    for est, exact in [(row.est_a, row.exact_a), (row.est_b, row.exact_b)]:
        assert exact > 0
        assert abs(est - exact) / exact < 0.32
    assert row.est_inter >= 0
    if row.exact_inter > 50:
        assert abs(row.est_inter - row.exact_inter) / row.exact_inter < 0.5


# -------------------------------------------------------------- skyline

def test_pareto_frontier_dominance_law(spark):
    from pmc_conversion_spark import tables
    got = {(r.p_partkey, r.p_size, r.price)
           for r in _q("sql_pareto_frontier")(spark, SF_DIR).collect()}
    parts = [(r.p_partkey, r.p_size, round(r.p_retailprice, 2))
             for r in tables.load(spark, SF_DIR, "part")
             .select("p_partkey", "p_size", "p_retailprice").collect()]

    def dominated(p):
        _, s, pr = p
        return any((qs >= s and qp <= pr and (qs > s or qp < pr))
                   for _, qs, qp in parts)

    expect = {p for p in parts if not dominated(p)}
    assert got == expect and got


# ------------------------------------------------------- fuzzy linkage

def test_fuzzy_blocked_links_recover_self(spark):
    out = _q("join_fuzzy_blocked")(spark, SF_DIR)
    rows = out.collect()
    assert rows
    # every dirty record's true master is itself; blocking must keep
    # recall at 100% for these perturbations (prefix+length preserved)
    by_id = {r.dirty_id: r for r in rows}
    docs = _q("text_fingerprint")(spark, SF_DIR).count()
    assert len(by_id) == docs
    self_hits = sum(1 for r in rows if r.clean_id == r.dirty_id)
    # ties on short titles may prefer a lower-id equal-distance master,
    # but the overwhelming majority must link to themselves
    assert self_hits >= 0.9 * len(rows)
    assert all(r.dist <= 2 for r in rows)


# ------------------------------------------------- range-time window

def test_range_frame_counts_trailing_hour_only(spark, fixture_df):
    rows = [(1, 100, "2024-01-01 10:00:00", 1.0),
            (2, 100, "2024-01-01 10:30:00", 2.0),
            (3, 100, "2024-01-01 11:30:00", 4.0),   # 10:00 falls out
            (4, 200, "2024-01-01 10:30:00", 8.0)]   # other user
    e = fixture_df(rows, "event_id bigint, user_id bigint, s string, value double") \
        .select("event_id", "user_id",
                F.to_timestamp("s").cast("timestamp_ntz").alias("ts"),
                "value", F.lit("x").alias("event_type"),
                F.lit("{}").alias("props"))
    import pmc_conversion_spark.tables as T
    orig = T.load
    try:
        T.load = lambda spark, sf, name, _e=e: _e if name == "events" \
            else orig(spark, sf, name)
        got = {r.event_id: (r.n_1h, r.sum_1h)
               for r in _q("win_frame_range_time")(spark, SF_DIR).collect()}
    finally:
        T.load = orig
    assert got == {1: (1, 1.0), 2: (2, 3.0), 3: (2, 6.0), 4: (1, 8.0)}


# ------------------------------------- retrieval / index / splits ops

def test_tfidf_ubiquitous_term_scores_zero(spark):
    rows = _q("text_tfidf_topk")(spark, SF_DIR).collect()
    assert len(rows) == 100
    assert all(r.tfidf >= 0 for r in rows)
    # descending by score with deterministic tie-break
    scores = [r.tfidf for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_inverted_index_postings_sorted_capped(spark):
    rows = _q("text_inverted_index")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r.df, 20)
        assert r.df >= 5


@pytest.mark.slow
def test_leakage_safe_split_keeps_clusters_together(spark):
    out = _q("split_leakage_safe")(spark, SF_DIR).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.split_key, set()).add(r.split)
    # every cluster (shared split_key) must sit in exactly one split
    assert all(len(s) == 1 for s in by_key.values())
    # singletons must agree with the per-doc splitter (same hash+salt)
    plain = {r.doc_id: r.split
             for r in _q("split_train_val_test")(spark, SF_DIR).collect()}
    for r in out:
        if r.split_key == r.doc_id:   # representative or singleton
            assert r.split == plain[r.doc_id]


def test_token_budget_select_is_greedy_prefix(spark):
    rows = _q("pipeline_token_budget_select")(spark, SF_DIR).collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, sel in by_src.items():
        sel.sort(key=lambda r: (-r.n_tokens, r.doc_id))
        cum = 0
        for r in sel:
            cum += r.n_tokens
            assert r.cum_tokens == cum
        assert cum <= 800


# -------------------------------- interval union / outer join / DQ ops

def _with_events(spark, e, fn):
    import pmc_conversion_spark.tables as T
    orig = T.load
    try:
        T.load = lambda spark, sf, name, _e=e: _e if name == "events" \
            else orig(spark, sf, name)
        return fn()
    finally:
        T.load = orig


def _events_fixture(fixture_df, rows):
    from pyspark.sql import functions as F
    return fixture_df(
        rows, "event_id bigint, user_id bigint, s string, "
              "event_type string, value double") \
        .select("event_id", "user_id",
                F.to_timestamp("s").cast("timestamp_ntz").alias("ts"),
                "event_type", "value", F.lit("{}").alias("props"))


def test_interval_union_merges_touching_and_overlapping(spark, fixture_df):
    rows = [(1, 1, "2024-01-01 10:00:00", "x", 0.0),
            (2, 1, "2024-01-01 10:05:00", "x", 0.0),   # overlaps 1
            (3, 1, "2024-01-01 10:15:00", "x", 0.0),   # touches 2's end
            (4, 1, "2024-01-01 12:00:00", "x", 0.0),   # disjoint
            (5, 2, "2024-01-01 10:00:00", "x", 0.0)]
    e = _events_fixture(fixture_df, rows)
    got = _with_events(
        spark, e,
        lambda: {(r.user_id, r.island): (r.covered_s, r.n_events)
                 for r in _q("ts_interval_union")(spark, SF_DIR).collect()})
    # user 1: events 1-3 chain into one island 10:00->10:25 (1500s) —
    # event 3 starts exactly at 2's end (touching joins, strict >
    # splits); event 4 alone (600s). user 2: one island.
    assert got == {(1, 1): (1500, 3), (1, 2): (600, 1), (2, 1): (600, 1)}


def test_left_outer_interval_pads_unmatched_purchases(spark, fixture_df):
    rows = [(1, 1, "2024-01-01 10:00:00", "purchase", 1.0),
            (2, 1, "2024-01-01 09:30:00", "click", 0.0),
            (3, 2, "2024-01-01 10:00:00", "purchase", 1.0),   # no click
            (4, 2, "2024-01-01 08:00:00", "click", 0.0)]      # too old
    e = _events_fixture(fixture_df, rows)
    rows_out = _with_events(
        spark, e,
        lambda: _q("stream_left_outer_interval")(spark, SF_DIR).collect())
    by_p = {r.p_event_id: r for r in rows_out}
    assert by_p[1].c_event_id == 2
    assert by_p[3].c_event_id is None and by_p[3].c_ts is None
    assert len(rows_out) == 2


def test_freshness_sla_finds_worst_gap(spark, fixture_df):
    rows = [(1, 1, "2024-01-01 00:00:00", "a", 0.0),
            (2, 1, "2024-01-01 06:00:00", "a", 0.0),   # 6h hole
            (3, 1, "2024-01-01 06:30:00", "a", 0.0),
            (4, 1, "2024-01-01 06:30:00", "b", 0.0)]
    e = _events_fixture(fixture_df, rows)
    got = _with_events(
        spark, e,
        lambda: {r.event_type: r
                 for r in _q("dq_freshness_sla")(spark, SF_DIR).collect()})
    assert got["a"].max_gap_s == 6 * 3600
    assert got["a"].n_last_hour == 2       # 06:00 and 06:30
    assert got["b"].max_gap_s is None      # single event: no gap
    assert got["b"].n_events == 1


def test_quality_logit_bounds_and_monotonicity(spark):
    rows = _q("text_quality_logit")(spark, SF_DIR).collect()
    assert rows and all(0.0 <= r.p_keep <= 1.0 for r in rows)
    # direction check on synthetic extremes through the same operator
    from pmc_conversion_spark.queries import llmdata as L
    import pmc_conversion_spark.tables as T
    from pyspark.sql import functions as F
    good = "the cat and the dog ran to the house in the garden " * 10
    bad = "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( ))) " * 10
    docs = spark.createDataFrame(
        [(1, good), (2, bad)], "doc_id long, text string") \
        .select("doc_id", "text", F.lit("en").alias("lang"),
                F.lit("s").alias("source"),
                F.length("text").alias("n_chars"))
    orig = T.load
    try:
        T.load = lambda spark, sf, name, _d=docs: _d if name == "documents" \
            else orig(spark, sf, name)
        got = {r.doc_id: r.p_keep
               for r in _q("text_quality_logit")(spark, SF_DIR).collect()}
    finally:
        T.load = orig
    assert got[1] > 0.9 and got[2] < 0.1


# -------------------------- SCD2 PIT join / z-order / audio / Q15 ops

def test_scd2_pointintime_exactly_one_version_per_fact(spark):
    out = _q("join_scd2_pointintime")(spark, SF_DIR)
    from pmc_conversion_spark import tables
    n_orders = tables.load(spark, SF_DIR, "orders").count()
    assert out.count() == n_orders           # bijective fact -> version
    # a %7 customer's balance is bumped only for as-of versions >= 2
    rows = [r for r in out.collect() if r.o_custkey % 7 == 0]
    assert rows
    from pmc_conversion_spark import tables as T
    bal = {r.c_custkey: r.c_acctbal
           for r in T.load(spark, SF_DIR, "customer").collect()}
    for r in rows:
        expect = bal[r.o_custkey] + (100 if r.as_of_version >= 2 else 0)
        assert abs(r.c_acctbal - expect) < 1e-9


def _morton(x, y, bits=8):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_reference_interleave(spark):
    rows = _q("sink_zorder_layout")(spark, SF_DIR).collect()
    assert len(rows) == 100
    for r in rows:
        assert r.z == _morton(r.x, r.y)
    # bijectivity of the arithmetic form over the full 8-bit domain
    seen = {_morton(x, y) for x in range(0, 256, 17)
            for y in range(0, 256, 13)}
    assert len(seen) == len(range(0, 256, 17)) * len(range(0, 256, 13))


def test_audio_frame_energy_matches_python_reference(spark):
    from pmc_conversion_spark import tables
    docs = {r.doc_id: r.text
            for r in tables.load(spark, SF_DIR, "documents")
            .select("doc_id", "text").limit(5).collect()}
    out = {(r.media_id, r.frame): r.energy
           for r in _q("mm_audio_frame_energy")(spark, SF_DIR).collect()}
    for did, txt in docs.items():
        cps = [ord(c) for c in txt[:1024]]
        for f in range(len(cps) // 256):
            seg = cps[f * 256:(f + 1) * 256]
            assert out[(did, f)] == sum(v * v for v in seg)


def test_top_supplier_is_argmax_with_ties(spark):
    from pyspark.sql import functions as F
    from pmc_conversion_spark import tables
    rows = _q("sql_top_supplier")(spark, SF_DIR).collect()
    assert rows
    li = tables.load(spark, SF_DIR, "lineitem")
    rev = (li.filter((F.col("l_shipdate") >= "1996-01-01")
                     & (F.col("l_shipdate") < "1996-04-01"))
           .groupBy("l_suppkey")
           .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")
                      * (1 - F.col("l_discount").cast("decimal(18,2)")))
                .alias("total")))
    top = rev.agg(F.max("total")).collect()[0][0]
    assert all(abs(r.total_revenue - float(top)) < 1e-6 for r in rows)


def test_new_vs_returning_identities(spark):
    from pmc_conversion_spark import tables
    rows = _q("agg_new_vs_returning")(spark, SF_DIR).collect()
    assert rows
    assert all(r.active_users == r.new_users + r.returning_users
               for r in rows)
    n_users = (tables.load(spark, SF_DIR, "events")
               .select("user_id").distinct().count())
    assert sum(r.new_users for r in rows) == n_users
    first_day = min(r.day for r in rows)
    by_day = {r.day: r for r in rows}
    assert by_day[first_day].returning_users == 0


def test_curriculum_rank_dense_and_band_monotone(spark):
    rows = sorted(_q("pipeline_curriculum_order")(spark, SF_DIR).collect(),
                  key=lambda r: r.curriculum_rank)
    assert [r.curriculum_rank for r in rows] == list(range(1, len(rows) + 1))
    bands = [r.band for r in rows]
    assert bands == sorted(bands)     # easy -> hard, never interleaved


def test_retention_cohort_triangle(spark):
    rows = _q("agg_retention_cohorts")(spark, SF_DIR).collect()
    assert rows
    assert all(r.day_offset >= 0 for r in rows)
    # offset-0 count per cohort == cohort size == new_users that day
    new = {r.day: r.new_users
           for r in _q("agg_new_vs_returning")(spark, SF_DIR).collect()}
    day0 = {r.cohort: r.n_active for r in rows if r.day_offset == 0}
    assert day0 == {d: n for d, n in new.items() if n > 0}
    # retention can never exceed cohort size
    for r in rows:
        assert r.n_active <= day0[r.cohort]


def test_pq_encode_reconstruction_beats_random_code(spark):
    import numpy as np
    from pmc_conversion_spark import tables
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in tables.load(spark, SF_DIR, "embeddings").collect()}
    codes = {}
    for r in _q("sim_pq_encode")(spark, SF_DIR).collect():
        codes.setdefault(r.vec_id, {})[r.sub] = r.code
    assert all(len(c) == 4 for c in codes.values())
    # assigned centroid must be the true argmin for every subvector
    for vid, subs in list(codes.items())[:25]:
        for sub, code in subs.items():
            sv = emb[vid][sub * 16:(sub + 1) * 16]
            dists = {cid: float(np.sum((sv - emb[cid][sub * 16:(sub + 1) * 16]) ** 2))
                     for cid in range(8)}
            best = min(dists.items(), key=lambda kv: (round(kv[1], 6), kv[0]))[0]
            assert code == best


def test_minhash_clusters_refine_exact_clusters(spark):
    # verified-LSH pairs are a subset of the exact jaccard pair graph,
    # so every minhash cluster must sit INSIDE one exact cluster
    exact = {r.doc_id: r.component
             for r in _q("dedup_cluster_cc")(spark, SF_DIR).collect()}
    approx = {}
    for r in _q("dedup_minhash_cluster")(spark, SF_DIR).collect():
        approx.setdefault(r.component, set()).add(r.doc_id)
    assert approx
    for members in approx.values():
        outer = {exact[m] for m in members}
        assert len(outer) == 1


def test_dateshift_preserves_within_subject_intervals(spark):
    from pmc_conversion_spark import tables
    out = {r.o_orderkey: (r.shifted_date, r.shift_days)
           for r in _q("f_dateshift_deid")(spark, SF_DIR).collect()}
    orders = [(r.o_orderkey, r.o_custkey, r.o_orderdate)
              for r in tables.load(spark, SF_DIR, "orders").collect()]
    by_cust = {}
    for ok, ck, od in orders:
        by_cust.setdefault(ck, []).append((ok, od))
    for ck, lst in by_cust.items():
        shifts = {out[ok][1] for ok, _ in lst}
        assert len(shifts) == 1               # per-subject constancy
        (s,) = shifts
        assert -14 <= s <= 14
        for ok, od in lst:                    # intervals preserved
            assert (out[ok][0] - od).days == s


def test_yoy_change_null_first_year_and_math(spark):
    rows = _q("win_percent_change_yoy")(spark, SF_DIR).collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.nation, []).append(r)
    for nation, lst in by_nation.items():
        lst.sort(key=lambda r: r.o_year)
        assert lst[0].pct_change is None
        for prev, cur in zip(lst, lst[1:]):
            if cur.pct_change is not None:
                expect = (cur.revenue - prev.revenue) / prev.revenue * 100
                assert abs(cur.pct_change - expect) < 1e-3


def test_benford_frequencies_sum_to_one(spark):
    rows = _q("agg_benford_audit")(spark, SF_DIR).collect()
    assert {r.digit for r in rows} <= set("123456789")
    assert abs(sum(r.observed_freq for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.benford_freq for r in rows) - 1.0) < 1e-3


def test_incremental_dedup_verdict_classes(spark):
    rows = _q("pipeline_incremental_dedup")(spark, SF_DIR).collect()
    by_v = {}
    for r in rows:
        by_v.setdefault(r.verdict, []).append(r)
    # every whitespace near-copy must link into the OLD corpus; the
    # min-id contract may pick an old doc similar to the original, so
    # the link is bounded by the original's id, not equal to it
    old_links = [r for r in by_v["dup_of_old"]
                 if 100000 <= r.doc_id < 200000]
    assert len(old_links) == 40               # all 40 copies caught
    for r in old_links:
        assert r.matched_id <= r.doc_id - 100000
    # copies of reversed variants link to the earlier new doc
    assert by_v["dup_in_batch"]
    for r in by_v["dup_in_batch"]:
        assert r.matched_id >= 100000
    assert by_v["accept"] and all(r.matched_id is None
                                  for r in by_v["accept"])


def test_incremental_pairs_equal_restricted_full_pairs(spark, fixture_df):
    from pmc_conversion_spark.functions.dedup import (
        ngram_jaccard_pairs, ngram_jaccard_pairs_incremental)
    docs = fixture_df(
        [(1, "a b c d e f"), (2, "a b c d e g"),
         (100, "a b c d e f"), (101, "x y z w v u"), (102, "x y z w v u")],
        "doc_id long, text string")
    full = {(r.doc_a, r.doc_b)
            for r in ngram_jaccard_pairs(docs, threshold_num=1,
                                         threshold_den=5).collect()}
    incr = {(r.doc_a, r.doc_b)
            for r in ngram_jaccard_pairs_incremental(
                docs, new_min_id=100, threshold_num=1,
                threshold_den=5).collect()}
    assert incr == {p for p in full if p[1] >= 100}
    assert (1, 2) in full and (1, 2) not in incr   # old×old skipped


def test_pii_audit_counts_planted_fixture(spark):
    rows = {r.source: r for r in _q("dq_pii_audit")(spark, SF_DIR).collect()}
    # 20 planted docs carry exactly one email + one phone each
    assert sum(r.n_emails for r in rows.values()) >= 20
    assert sum(r.n_phones for r in rows.values()) >= 20
    assert sum(r.n_docs_with_pii for r in rows.values()) >= 20
    for r in rows.values():
        assert r.n_docs_with_pii <= r.n_docs


def test_active_streaks_identities(spark):
    rows = _q("win_active_streaks")(spark, SF_DIR).collect()
    assert rows
    nvr = {r.day: r for r in _q("agg_new_vs_returning")(spark, SF_DIR).collect()}
    first_overall = min(nvr)
    for r in rows:
        assert 1 <= r.longest_streak
        assert r.n_streaks >= 1
        assert r.first_day >= first_overall


def test_observe_metrics_collected_in_same_pass(spark):
    from pmc_conversion_spark import tables
    df = _q("dq_observe_inline_metrics")(spark, SF_DIR)
    rows = df.collect()
    obs = df._dq_observation
    n_events = tables.load(spark, SF_DIR, "events").count()
    got = obs.get
    assert got["rows_scanned"] == n_events
    assert got["rows_dropped"] == n_events - sum(r.n for r in rows)


def test_lateral_topk_matches_window_form(spark):
    rows = _q("sql_lateral_topk")(spark, SF_DIR).collect()
    by_c = {}
    for r in rows:
        by_c.setdefault(r.c_custkey, []).append(r.o_totalprice)
    from pmc_conversion_spark import tables
    orders = tables.load(spark, SF_DIR, "orders").collect()
    for ck, prices in by_c.items():
        assert len(prices) <= 2
        expect = sorted((o.o_totalprice for o in orders
                         if o.o_custkey == ck), reverse=True)[:2]
        assert sorted(prices, reverse=True) == expect


def test_zstd_sink_footer_says_zstd(spark):
    import glob
    import os

    import pyarrow.parquet as pq

    from pmc_conversion_spark.util import scratch_root
    _q("sink_codec_zstd")(spark, SF_DIR).count()
    # locate the written file via the process-private scratch root
    # (do NOT call scratch_dir here — it wipes on invocation)
    base = os.path.join(scratch_root(), "sink_codec_zstd")
    files = glob.glob(os.path.join(base, "**", "*.parquet"),
                      recursive=True)
    assert files
    meta = pq.ParquetFile(files[0]).metadata
    codecs = {meta.row_group(i).column(0).compression
              for i in range(meta.num_row_groups)}
    assert codecs == {"ZSTD"}


def test_zorder_layout_prunes_2d_boxes_better_than_row_major(spark):
    """Write orders twice — z-ordered vs single-dimension-sorted —
    with small row groups, and count row groups whose (x, y) min/max
    boxes intersect a small 2-D query box. The z-order layout must
    touch fewer groups: that's the whole point of the curve."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from pmc_conversion_spark import tables
    from pmc_conversion_spark.util import scratch_dir

    # sf0.01: enough rows for ~100 small row groups — at sf0.001 the
    # 12-group granularity is too coarse for the layouts to separate
    o = tables.load(spark, "/root/testdata/sf0.01", "orders")
    x = (F.col("o_custkey") % 256).alias("x")
    day = F.floor(F.col("o_orderdate").cast("timestamp").cast("long")
                  / F.lit(86400)).cast("bigint")
    y = (day % 256).alias("y")
    pts = o.select("o_orderkey", x, y)
    z = sum((((F.col("x") / (1 << i)).cast("bigint") % 2) * (1 << (2 * i))
             + ((F.col("y") / (1 << i)).cast("bigint") % 2)
             * (1 << (2 * i + 1))) for i in range(8))
    zdf = pts.withColumn("z", z)

    def write_sorted(df, order_col, name):
        d = scratch_dir(name)
        (df.repartition(1).sortWithinPartitions(order_col)
         .write.mode("overwrite")
         .option("parquet.block.size", 4 * 1024).parquet(d))
        return glob.glob(os.path.join(d, "*.parquet"))[0]

    fz = write_sorted(zdf, "z", "zorder_test_z")
    fx = write_sorted(zdf, "x", "zorder_test_rowmajor")

    def groups_touching(path, x_lo, x_hi, y_lo, y_hi):
        md = pq.ParquetFile(path).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        xi, yi = names.index("x"), names.index("y")
        touch = 0
        for g in range(md.num_row_groups):
            sx = md.row_group(g).column(xi).statistics
            sy = md.row_group(g).column(yi).statistics
            if sx.min <= x_hi and sx.max >= x_lo \
                    and sy.min <= y_hi and sy.max >= y_lo:
                touch += 1
        return touch, md.num_row_groups

    # a box NARROW in y but covering all of x: the x-sorted layout has
    # zero y locality (every group spans the y range) while z-order
    # clusters y bits into the curve — the case 1-D sorting cannot serve
    tz, nz = groups_touching(fz, 0, 255, 0, 15)
    tx, nx = groups_touching(fx, 0, 255, 0, 15)
    assert nz >= 20 and nx >= 20        # enough groups to mean anything
    assert tx / nx > 0.9                # 1-D layout reads ~everything
    assert tz / nz < 0.5 * (tx / nx)    # z-order reads less than half


def test_patch_grid_covers_image_exactly(spark):
    rows = _q("mm_patch_grid")(spark, SF_DIR).collect()
    by_m = {}
    for r in rows:
        by_m.setdefault(r.media_id, []).append(r)
    assert by_m
    for mid, ps in by_m.items():
        h = 224 + (mid % 3) * 32
        w = 224 + (mid % 5) * 32
        assert len(ps) == (h // 16) * (w // 16)
        ids = sorted(p.patch_id for p in ps)
        assert ids == list(range(len(ps)))          # dense, gapless
        for p in ps:
            assert p.y0 == p.patch_row * 16 and p.x0 == p.patch_col * 16
            assert 0 <= p.y0 < h and 0 <= p.x0 < w


def test_scene_cuts_are_real_jumps(spark):
    # cuts computed at sf0.01 (sf0.001 docs are mostly < 512 chars)
    rows = _q("mm_scene_cut_detect")(spark, "/root/testdata/sf0.01") \
        .collect()
    assert rows
    energies = {(r.media_id, r.frame): r.energy
                for r in _q("mm_audio_frame_energy")(
                    spark, "/root/testdata/sf0.01").collect()}
    for r in rows:
        prev = energies[(r.media_id, r.frame - 1)]
        assert abs(r.energy - prev) == r.jump > 50000


def test_histogram_quantile_sketch_error_bounded_by_bin_width(spark):
    from pmc_conversion_spark import tables
    est = {r.q: r.est_value
           for r in _q("sketch_histogram_quantiles")(spark, SF_DIR).collect()}
    prices = sorted(r.o_totalprice
                    for r in tables.load(spark, SF_DIR, "orders")
                    .select("o_totalprice").collect())
    n = len(prices)
    for q, e in est.items():
        exact = prices[min(int(q * n), n - 1)]
        assert abs(e - exact) <= 600_000 / 64 + 1e-6   # one bin width


def test_adc_topk_approximates_exact_neighbors(spark):
    import numpy as np
    from pmc_conversion_spark import tables
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in tables.load(spark, SF_DIR, "embeddings").collect()}
    rows = _q("sim_adc_topk")(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, lst in by_q.items():
        assert len(lst) == 3
        # ADC is an approximation: its top-3 must land within the
        # exact-L2 top quartile of the corpus (coarse 8-centroid
        # codebooks can't guarantee exact top-3)
        qv = emb[qid]
        exact = sorted((float(np.sum((qv - v) ** 2)), cid)
                       for cid, v in emb.items() if cid != qid)
        quartile_ids = {cid for _, cid in exact[:len(exact) // 4]}
        hits = sum(1 for r in lst if r.cand_id in quartile_ids)
        assert hits >= 2


def test_parquet_bloom_filter_present_in_footer(spark):
    import glob
    import os

    import pyarrow.parquet as pq

    from pmc_conversion_spark.util import scratch_root
    _q("sink_parquet_bloom_filter")(spark, SF_DIR).count()
    base = os.path.join(scratch_root(), "sink_parquet_bloom_filter")
    files = glob.glob(os.path.join(base, "*.parquet"))
    assert files
    with_bloom = sum(os.path.getsize(f) for f in files)
    # control: identical data without the bloom option; the bloom adds
    # ~ndv*10 bits per row group (pyarrow's metadata API does not
    # expose bloom offsets, so size delta is the observable)
    from pmc_conversion_spark import tables
    ctrl = os.path.join(scratch_root(), "bloom_ctrl")
    (tables.load(spark, SF_DIR, "orders")
     .select("o_orderkey", "o_custkey", "o_totalprice")
     .coalesce(1).write.mode("overwrite")
     .option("parquet.enable.dictionary", "false").parquet(ctrl))
    without = sum(os.path.getsize(f)
                  for f in glob.glob(os.path.join(ctrl, "*.parquet")))
    assert with_bloom - without > 1000
