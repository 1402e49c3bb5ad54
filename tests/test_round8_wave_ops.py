"""Invariant tests for the round-8 wave operators.

The oracle gate already pins value-equality against DuckDB; these pin
the MATHEMATICAL invariants the oracle comparison cannot express (a
wrong-but-identically-wrong implementation would pass the hash check,
not these).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from __spark_entry__ import queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return queries()


def test_breusch_pagan_lm_bounds(spark, qs):
    """LM = n·R² with R² ∈ [0, 1], so 0 ≤ LM ≤ n; the 5% flag must
    agree with the literal 3.841 threshold."""
    r = qs["agg_breusch_pagan"](spark, SF_DIR).first()
    assert 0.0 <= r["bp_lm"] <= r["n_days"]
    assert r["heteroskedastic_5pct"] == (r["bp_lm"] > 3.841)


def test_cohens_kappa_identities(spark, qs):
    """kappa ∈ [−1, 1]; observed and expected agreements are
    probabilities; kappa > 0 iff observed beats chance."""
    r = qs["agg_cohens_kappa"](spark, SF_DIR).first()
    assert 0.0 <= r["observed_agreement"] <= 1.0
    assert 0.0 <= r["expected_agreement"] <= 1.0
    assert -1.0 <= r["kappa"] <= 1.0
    assert (r["kappa"] > 0) == (
        r["observed_agreement"] > r["expected_agreement"])


def test_newey_west_reduces_to_positive_se(spark, qs):
    """Both SEs are positive; the HAC inflation factor is exactly
    their ratio (internal consistency of the three outputs)."""
    r = qs["agg_newey_west_se"](spark, SF_DIR).first()
    assert r["se_iid"] > 0 and r["se_newey_west"] > 0
    assert abs(r["hac_inflation"]
               - r["se_newey_west"] / r["se_iid"]) < 1e-3
    # differenced counts are negatively autocorrelated by
    # construction: HAC must DEFLATE the iid SE here
    assert r["hac_inflation"] < 1.0


def test_hoeffding_d_range(spark, qs):
    """D ∈ [−0.5, 1] (Hoeffding 1948); daily count and revenue are
    strongly dependent, so D must be clearly positive."""
    r = qs["agg_hoeffding_d"](spark, SF_DIR).first()
    assert -0.5 <= r["hoeffding_d"] <= 1.0
    assert r["hoeffding_d"] > 0.0


def test_variance_ratio_positive(spark, qs):
    """VR is a ratio of variances: > 0; differenced daily counts are
    mean-reverting, so VR(5) < 1 and the z-stat is negative."""
    r = qs["ts_variance_ratio"](spark, SF_DIR).first()
    assert r["vr5"] > 0.0
    assert r["vr5"] < 1.0
    assert r["z_homoskedastic"] < 0.0


def test_ulcer_index_rms_vs_max(spark, qs):
    """RMS of drawdowns cannot exceed the max drawdown, and both are
    percentages in [0, 100]."""
    r = qs["win_ulcer_index"](spark, SF_DIR).first()
    assert 0.0 <= r["ulcer_index_pct"] <= r["max_drawdown_pct"] + 1e-9
    assert r["max_drawdown_pct"] <= 100.0


def test_kaufman_er_bounds_and_warmup(spark, qs):
    """ER ∈ [0, 1] by the triangle inequality (|net| ≤ Σ|moves|);
    the first 9 days have no full window → NULL."""
    rows = qs["win_kaufman_er"](spark, SF_DIR).collect()
    srt = sorted(rows, key=lambda r: r["d"])
    assert all(r["efficiency_ratio"] is None for r in srt[:9])
    vals = [r["efficiency_ratio"] for r in srt
            if r["efficiency_ratio"] is not None]
    assert vals and all(0.0 <= v <= 1.0 for v in vals)


def test_cep_negation_partitions_purchases(spark, qs):
    """Cold purchases are a subset of purchases per user, and the
    positive pattern (followed_by) + negation cover consistently:
    a purchase unmatched by ANY prior click within 30min is 'cold',
    so n_cold ≤ n_purchases with equality for click-less users."""
    rows = qs["stream_cep_negation"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_cold"] <= r["n_purchases"]


def test_yule_k_spectrum_identities(spark, qs):
    """Per language: hapax ≤ vocab ≤ tokens; ratios are
    probabilities; K > 0 for any non-degenerate corpus."""
    rows = qs["text_yule_k"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["hapax"] <= r["vocab_size"] <= r["n_tokens"]
        assert 0.0 <= r["hapax_ratio"] <= 1.0
        assert 0.0 <= r["dis_ratio"] <= 1.0 - r["hapax_ratio"] + 1e-9
        assert r["yule_k"] > 0.0


def test_dunn_pairs_and_bonferroni(spark, qs):
    """Exactly C(3,2)=3 ordered pairs over the return flags; the
    reject flag must agree with |z| > 2.394."""
    rows = qs["agg_dunn_posthoc"](spark, SF_DIR).collect()
    assert len(rows) == 3
    assert all(r["group_a"] < r["group_b"] for r in rows)
    for r in rows:
        assert r["reject_bonferroni"] == (abs(r["z"]) > 2.394)


def test_brunner_munzel_effect_size_prob(spark, qs):
    """p̂ = P(X_F < X_O) + ½P(=) is a probability; the statistic's
    sign must agree with p̂ vs ½."""
    r = qs["agg_brunner_munzel"](spark, SF_DIR).first()
    assert 0.0 <= r["p_hat"] <= 1.0
    if abs(r["p_hat"] - 0.5) > 1e-6:
        assert (r["bm_stat"] > 0) == (r["p_hat"] > 0.5)


def test_stuart_maxwell_chi2_nonnegative(spark, qs):
    """d'S⁻¹d is a quadratic form in a covariance inverse: ≥ 0; the
    flag agrees with the literal df=2 critical value."""
    r = qs["agg_stuart_maxwell"](spark, SF_DIR).first()
    assert r["chi2_stat"] >= 0.0
    assert r["reject_5pct"] == (r["chi2_stat"] > 5.991)


def test_cindex_probability_bounds(spark, qs):
    """C ∈ [0, 1]; usable pairs positive on any corpus with both
    events and delay spread."""
    r = qs["agg_harrell_cindex"](spark, SF_DIR).first()
    assert r["usable_pairs"] > 0
    assert 0.0 <= r["c_index"] <= 1.0


def test_turning_points_bounds(spark, qs):
    """At most n−2 interior extrema; expectation formula is pinned
    to 2(n−2)/3 and the count is consistent with the z sign."""
    r = qs["ts_turning_points"](spark, SF_DIR).first()
    assert 0 <= r["turning_points"] <= r["n_days"] - 2
    assert abs(r["expected"] - 2.0 * (r["n_days"] - 2) / 3.0) < 1e-3
    assert (r["z_stat"] > 0) == (r["turning_points"] > r["expected"])


def test_gries_dp_bounds_and_topk(spark, qs):
    """DP ∈ [0, 1); exactly 20 terms; the corpus-frequency column is
    a valid top-k (no zero frequencies)."""
    rows = qs["text_gries_dp"](spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 <= r["dp"] < 1.0
        assert r["corpus_freq"] > 0


def test_jpeg_entropy_size_matches_payload(spark, qs):
    """The symbolic bit count must equal the REAL encoder's payload
    length minus stuffing bytes (byte-level ground truth the oracle
    cannot see)."""
    from pmc_conversion_spark.functions import multimodal as MM
    rows = qs["mm_jpeg_entropy_size"](spark, SF_DIR).collect()
    assert rows
    for r in rows[:25]:
        blob = MM.encode_jpeg_gray(
            MM.synth_jpeg_coeffs(r["media_id"]), 16, 8)
        sos = blob.index(b"\xff\xda")
        payload = blob[sos + 2 + 8: -2]
        stuffed = sum(1 for i in range(len(payload) - 1)
                      if payload[i] == 0xFF and payload[i + 1] == 0x00)
        assert r["entropy_bytes"] == len(payload) - stuffed, r
        assert (r["entropy_bits"] + 7) // 8 == r["entropy_bytes"]


def test_capture_recapture_bounds(spark, qs):
    """Recaptures ≤ both captures; Chapman ≥ union lower bound
    (n1 + n2 − m) up to rounding; positive coverage."""
    r = qs["dq_capture_recapture"](spark, SF_DIR).first()
    assert r["n_recaptured"] <= min(r["n_capture1"], r["n_capture2"])
    lower = r["n_capture1"] + r["n_capture2"] - r["n_recaptured"]
    assert r["chapman_estimate"] >= lower - 1.0
    assert r["coverage_ratio"] > 0


def test_gpd_moments_consistency(spark, qs):
    """β̂ > 0 always (scale); ξ̂ < ½ by construction of the moment
    estimator (ξ = ½(1 − e²/v) with e², v > 0)."""
    r = qs["agg_gpd_tail_fit"](spark, SF_DIR).first()
    assert r["n_exceedances"] > 1
    assert r["beta_hat_dollars"] > 0
    assert r["xi_hat"] < 0.5
    assert r["mean_excess_dollars"] > 0


def test_kpss_positive_and_flag(spark, qs):
    """η > 0 (ratio of sums of squares); flag agrees with the
    literal 0.463 level-stationarity critical value."""
    r = qs["ts_kpss_test"](spark, SF_DIR).first()
    assert r["kpss_stat"] > 0.0
    assert r["reject_level_stationary_5pct"] == (r["kpss_stat"] > 0.463)


def test_white_lm_bounds_and_nesting(spark, qs):
    """0 ≤ LM ≤ n (LM = n·R²); White's 2-regressor R² can only add
    explanatory power over BP's 1-regressor form, so White LM ≥ BP
    LM up to the shared residual grid."""
    w = qs["agg_white_test"](spark, SF_DIR).first()
    b = qs["agg_breusch_pagan"](spark, SF_DIR).first()
    assert 0.0 <= w["white_lm"] <= w["n_days"]
    assert w["heteroskedastic_5pct"] == (w["white_lm"] > 5.991)
    assert w["white_lm"] >= b["bp_lm"] - 1e-3


def test_poisson_dispersion_identities(spark, qs):
    """D > 0; index = D/(n−1) to rounding; the z approximation's
    sign must agree with which side of 1 the index falls (the
    sf0.001 fixture spreads orders REGULARLY → underdispersed,
    index < 1 with z < 0 — itself a real finding the test pins)."""
    r = qs["agg_poisson_dispersion"](spark, SF_DIR).first()
    assert r["dispersion_stat"] > 0
    assert abs(r["dispersion_index"]
               - r["dispersion_stat"] / (r["n_days"] - 1)) < 1e-4
    if r["dispersion_index"] < 0.9:
        assert r["z_overdispersion"] < 0
    elif r["dispersion_index"] > 1.1:
        assert r["z_overdispersion"] > 0


def test_damm_checksum_properties(spark, qs):
    """Every row verifies (appending the check digit folds to 0);
    digits are 0..9; single-digit mutation breaks verification (the
    error-detection property, checked in plain Python against the
    same table)."""
    rows = qs["f_damm_checksum"](spark, SF_DIR).collect()
    assert rows
    assert all(r["verifies"] for r in rows)
    assert all(0 <= r["damm_digit"] <= 9 for r in rows)
    from pmc_conversion_spark.queries.scalars import _DAMM_TBL

    def fold(s):
        a = 0
        for ch in s:
            a = int(_DAMM_TBL[a * 10 + int(ch)])
        return a

    for r in rows[:20]:
        pid = r["protected_id"]
        assert fold(pid) == 0
        for i in range(len(pid)):        # every single-digit error
            for repl in "0123456789":
                if repl != pid[i]:
                    assert fold(pid[:i] + repl + pid[i + 1:]) != 0


def test_pettitt_identities(spark, qs):
    """K = max|U_t| is bounded by the no-overlap maximum t(n−t) ≤ n²/4;
    the changepoint index is interior; the p-flag agrees with 0.05."""
    r = qs["ts_pettitt_test"](spark, SF_DIR).first()
    n = r["n_days"]
    assert 0 <= r["k_stat"] <= n * n / 4 + n
    assert 1 <= r["cp_t"] < n
    assert r["changepoint_5pct"] == (r["p_approx"] < 0.05)


def test_buishand_snht_consistency(spark, qs):
    """Both homogeneity statistics are positive; SNHT's T0 is bounded
    by the algebraic maximum A²n/(t(n−t)Q) ≤ n·max A²/(1·(n−1)·Q),
    and the two tests run on the same frame (same n)."""
    rb = qs["ts_buishand_range"](spark, SF_DIR).first()
    rs = qs["ts_snht"](spark, SF_DIR).first()
    assert rb["rb_stat"] > 0
    assert rs["t0_stat"] > 0
    assert rb["n_days"] == rs["n_days"]
    assert 1 <= rs["cp_t"] < rs["n_days"]


def test_bartels_rvn_range(spark, qs):
    """RVN ∈ (0, 4); its expectation under randomness is 2; the flag
    matches the 1.96 two-sided gate."""
    r = qs["ts_bartels_rank"](spark, SF_DIR).first()
    assert 0.0 < r["rvn"] < 4.0
    assert r["nonrandom_5pct"] == (abs(r["z_stat"]) > 1.96)


def test_dfa_alpha_plausible(spark, qs):
    """Fluctuations must GROW with scale (logF(64) > logF(4)) and the
    scaling exponent of a real counting series sits in (0, 2)."""
    r = qs["ts_dfa_alpha"](spark, SF_DIR).first()
    assert r["logf_s64"] > r["logf_s4"]
    assert 0.0 < r["dfa_alpha"] < 2.0


def test_higuchi_fd_range(spark, qs):
    """A curve's Higuchi dimension lies in [1, 2]; allow a small
    estimation slack on the dyadic 5-point grid."""
    r = qs["ts_higuchi_fd"](spark, SF_DIR).first()
    assert 0.9 <= r["higuchi_fd"] <= 2.1


def test_permutation_entropy_bounds(spark, qs):
    """h_norm ∈ [0, 1]; at most 6 ordinal patterns exist for dim 3;
    the triple count is the day count minus 2."""
    r = qs["ts_permutation_entropy"](spark, SF_DIR).first()
    assert 0.0 <= r["h_norm"] <= 1.0
    assert 1 <= r["n_patterns"] <= 6
    rp = qs["ts_pettitt_test"](spark, SF_DIR).first()
    assert r["n_triples"] == rp["n_days"] - 2


def test_deming_ccc_ba_consistency(spark, qs):
    """The three method-comparison ops share one instrument pair:
    same n; CCC ≤ |r| (C_b ≤ 1); Deming slope positive with r > 0;
    Bland-Altman limits bracket the mean difference."""
    rd = qs["agg_deming_regression"](spark, SF_DIR).first()
    rc = qs["agg_lin_ccc"](spark, SF_DIR).first()
    rb = qs["agg_bland_altman"](spark, SF_DIR).first()
    assert rd["n_days"] == rc["n_days"] == rb["n_days"]
    assert rd["pearson_r"] == rc["pearson_r"]
    assert abs(rc["ccc"]) <= abs(rc["pearson_r"]) + 1e-9
    assert 0.0 < rc["accuracy_cb"] <= 1.0 + 1e-9
    assert (rd["deming_slope"] > 0) == (rd["pearson_r"] > 0)
    assert rb["loa_low_usd"] < rb["mean_diff_usd"] < rb["loa_high_usd"]
    assert 0 <= rb["n_outside"] <= rb["n_days"]


def test_cronbach_alpha_bounds(spark, qs):
    """alpha ≤ 1 always; for independent Poisson-split channels it
    should be small, not near 1."""
    r = qs["agg_cronbach_alpha"](spark, SF_DIR).first()
    assert r["k_items"] == 5
    assert r["cronbach_alpha"] <= 1.0


def test_icc_oneway_bounds(spark, qs):
    """ICC(1,1) ∈ (−1, 1); effective group size k̄ ≥ 2 given the
    HAVING n_i ≥ 2 filter; N ≥ 2a."""
    r = qs["agg_icc_oneway"](spark, SF_DIR).first()
    assert -1.0 < r["icc1"] < 1.0
    assert r["kbar"] >= 2.0 - 1e-9
    assert r["n_obs"] >= 2 * r["n_groups"]


def test_gwets_ac1_identities(spark, qs):
    """AC1 ≤ 1; chance agreement ≤ 0.5 by construction (2π(1−π));
    sign agrees with po vs pe."""
    r = qs["agg_gwets_ac1"](spark, SF_DIR).first()
    assert r["gwets_ac1"] <= 1.0
    assert 0.0 <= r["chance_agreement"] <= 0.5
    assert (r["gwets_ac1"] > 0) == (
        r["observed_agreement"] > r["chance_agreement"])


def test_kendall_w_bounds(spark, qs):
    """W ∈ [0, 1]; chi2 = m(n−1)W exactly; full 12-object frame."""
    r = qs["agg_kendall_w"](spark, SF_DIR).first()
    assert 0.0 <= r["kendall_w"] <= 1.0
    assert r["n_objects"] == 12
    assert abs(r["chi2"] - r["n_judges"] * 11 * r["kendall_w"]) < 1e-3


def test_iv_2sls_diagnostics(spark, qs):
    """Quantity mechanically drives billed revenue: both estimates
    positive; the mechanical instrument must be strong (F ≫ 10)."""
    r = qs["agg_iv_2sls"](spark, SF_DIR).first()
    assert r["beta_iv"] > 0 and r["beta_ols"] > 0
    assert r["first_stage_f"] > 10.0
    # the price-mix channel OLS absorbs is positive here: IV > OLS
    assert r["beta_iv"] > r["beta_ols"]


def test_rdd_sides_populated(spark, qs):
    """Both bandwidth sides carry customers; the jump is finite and
    the two slopes are real numbers (per-$1000 scaling)."""
    r = qs["agg_rdd_sharp"](spark, SF_DIR).first()
    assert r["n_left"] > 0 and r["n_right"] > 0
    assert r["rdd_jump"] is not None
    assert abs(r["slope_left_per_k"]) < 1e6
    assert abs(r["slope_right_per_k"]) < 1e6


def test_page_l_bounds(spark, qs):
    """L lies between the exact algebraic min/max Σj·R_j for m
    judges: both attained at perfectly concordant rankings."""
    r = qs["agg_page_trend_test"](spark, SF_DIR).first()
    m = r["n_judges"]
    lmin = m * sum(j * (13 - j) for j in range(1, 13))
    lmax = m * sum(j * j for j in range(1, 13))
    assert lmin <= r["page_l"] <= lmax
    assert r["monotone_trend_5pct"] == (abs(r["z_stat"]) > 1.96)


def test_jonckheere_u_bounds(spark, qs):
    """2U ∈ [0, 2·Σ_{g<h} n_g·n_h] ⊆ [0, n²]; uniform priorities ⇒
    modest |z|."""
    r = qs["agg_jonckheere_terpstra"](spark, SF_DIR).first()
    assert 0 <= r["jt_u2"] <= r["n_orders"] ** 2
    assert abs(r["z_stat"]) < 50


def test_jonckheere_priority_group_data_contract(spark):
    """ADVICE r9: the histogram-derived group sizes silently drop any
    order whose parsed priority g is NULL or outside 1..5 (the old
    groupBy('g') counted such rows in n, though hist already excluded
    them from U). Pin the DATA CONTRACT the derivation relies on:
    every o_orderpriority parses to g ∈ 1..5 — if a future data drop
    deviates from the 'N-...' prefix format, this fails loudly instead
    of the statistic drifting."""
    from pmc_conversion_spark import tables
    o = tables.load(spark, SF_DIR, "orders")
    g = F.substring("o_orderpriority", 1, 1).cast("int")
    bad = o.filter(g.isNull() | (g < 1) | (g > 5)).count()
    assert bad == 0, f"{bad} orders outside the g∈1..5 priority contract"


def test_event_study_internal_consistency(spark, qs):
    """5-day event window; t = CAR/(σ√5) has the sign of CAR; the
    estimation window is two full years of days."""
    r = qs["agg_event_study_car"](spark, SF_DIR).first()
    # the daily frame carries only days with >=1 order; at tiny SF
    # some of the 5 calendar event days are silent
    assert 1 <= r["n_event"] <= 5
    assert 300 <= r["n_est"] <= 731
    assert (r["t_stat"] >= 0) == (r["car"] >= 0)


def test_engle_granger_beta_positive(spark, qs):
    """Two cumulative revenue shares of one corpus co-trend: the
    cointegrating beta must be positive and the DF stat negative
    (residuals mean-revert, never explosive)."""
    r = qs["ts_engle_granger"](spark, SF_DIR).first()
    assert r["coint_beta"] > 0
    assert r["df_stat"] < 0
    assert r["cointegrated_5pct"] == (r["df_stat"] < -3.37)


def test_nelson_aalen_vs_km_relation(spark, qs):
    """Hazard accumulates: cum_hazard nondecreasing in dur; the
    Fleming-Harrington survival exp(−H) dominates KM at matching
    durations (classical inequality)."""
    na = {r["dur_days"]: r for r in
          qs["agg_nelson_aalen"](spark, SF_DIR).collect()}
    km = {r["dur_days"]: r for r in
          qs["agg_km_greenwood"](spark, SF_DIR).collect()}
    durs = sorted(na)
    assert all(na[a]["cum_hazard"] <= na[b]["cum_hazard"] + 1e-9
               for a, b in zip(durs, durs[1:]))
    for d in set(durs) & set(km):
        assert na[d]["fh_survival"] >= km[d]["survival"] - 1e-6


def test_logrank_identities(spark, qs):
    """chi2 ≥ 0; flag agrees with 3.841; expected events positive."""
    r = qs["agg_logrank_test"](spark, SF_DIR).first()
    assert r["logrank_chi2"] >= 0
    assert r["expected_g1"] > 0
    assert r["differ_5pct"] == (r["logrank_chi2"] > 3.841)


def test_rmst_bounds(spark, qs):
    """0 < RMST ≤ τ; the integral of a nonincreasing S starting at 1
    is at most τ and at least S(τ)·τ > 0."""
    r = qs["agg_rmst"](spark, SF_DIR).first()
    assert 0 < r["rmst_days"] <= r["tau_days"]
    assert r["n_steps"] >= 1


def test_chain_ladder_runoff(spark, qs):
    """The oldest origin is fully developed (reserve 0); every
    reserve is nonnegative when dev factors ≥ 1, and ultimate =
    latest + reserve identically."""
    rows = {r["origin_year"]: r for r in
            qs["agg_chain_ladder"](spark, SF_DIR).collect()}
    assert set(rows) == {1995, 1996, 1997, 1998}
    assert rows[1995]["reserve_usd"] == 0.0
    for r in rows.values():
        assert abs(r["ultimate_usd"]
                   - (r["latest_usd"] + r["reserve_usd"])) < 0.05
    # later origins are less developed: reserve share grows
    assert (rows[1998]["reserve_usd"] / rows[1998]["ultimate_usd"]
            >= rows[1996]["reserve_usd"] / rows[1996]["ultimate_usd"]
            - 1e-9)


def test_atkinson_ordering(spark, qs):
    """0 ≤ A(1) ≤ A(2) < 1 — higher aversion never reports less
    inequality (Atkinson monotonicity in eps)."""
    r = qs["agg_atkinson_index"](spark, SF_DIR).first()
    assert 0.0 <= r["atkinson_eps1"] < 1.0
    assert r["atkinson_eps1"] <= r["atkinson_eps2"] < 1.0


def test_rbo_bounds(spark, qs):
    """RBO ∈ [0, 1]; overlap at depth k bounded by k; rbo_ext ≥
    the minimum implied by the final overlap alone."""
    r = qs["agg_rank_biased_overlap"](spark, SF_DIR).first()
    assert 0.0 <= r["rbo_ext"] <= 1.0
    assert 0 <= r["overlap_at_k"] <= r["depth_k"]


def test_png_roundtrip_lossless(spark, qs):
    """PNG is lossless: decoded checksums must equal the synthetic
    formula replayed in python exactly, for every image."""
    import numpy as np
    from pmc_conversion_spark.functions.multimodal import (
        synth_png_pixels)
    rows = qs["mm_decode_real_png"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows[:10]:
        px = synth_png_pixels(r["media_id"], 24, 16)
        wgt = ((np.arange(16)[:, None] + 1)
               * (np.arange(24)[None, :] + 1))
        assert r["width"] == 24 and r["height"] == 16
        assert r["pix_sum"] == int(px.sum(dtype=np.int64))
        assert r["pix_weighted"] == int(
            (px.astype(np.int64) * wgt).sum())


def test_png_codec_rejects_corruption():
    """Flipping any content byte must surface as a CRC or structure
    error, never silent wrong pixels."""
    import pytest as _pytest
    from pmc_conversion_spark.functions.multimodal import (
        decode_png_gray, encode_png_gray, synth_png_pixels)
    enc = bytearray(encode_png_gray(synth_png_pixels(42, 24, 16)))
    enc[30] ^= 0x01  # inside IHDR payload/CRC region
    with _pytest.raises((ValueError, NotImplementedError)):
        decode_png_gray(bytes(enc))


def test_heaps_law_plausible(spark, qs):
    """0 <= beta <= 1 (the synthetic fixture vocabulary is CLOSED, so
    beta = 0 is the correct answer there); K positive; all 10
    checkpoints contribute."""
    r = qs["text_heaps_law_fit"](spark, SF_DIR).first()
    assert 0.0 <= r["heaps_beta"] <= 1.0
    assert r["heaps_k"] > 0
    assert r["n_points"] == 10


def test_good_turing_spectrum(spark, qs):
    """Spectrum rows are positive; mass shares are probabilities and
    sum below 1 over the rare head."""
    rows = qs["vocab_good_turing"](spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 12
    assert all(r["n_r"] > 0 for r in rows)
    assert all(0.0 <= r["mass_share"] <= 1.0 for r in rows)
    assert sum(r["mass_share"] for r in rows) <= 1.0 + 1e-6


def test_burrows_delta_metric_properties(spark, qs):
    """Delta is symmetric by construction (a<b stored once),
    nonnegative, and defined for all source pairs."""
    rows = qs["text_burrows_delta"](spark, SF_DIR).collect()
    k = {(r["source_a"], r["source_b"]) for r in rows}
    assert all(r["delta"] >= 0 for r in rows)
    assert all(a < b for a, b in k)
    n_src = len({a for a, _ in k} | {b for _, b in k})
    assert len(rows) == n_src * (n_src - 1) // 2


def test_point_in_polygon_sanity(spark, qs):
    """Share in (0,1): the hexagon covers a strict sub-region of the
    101x103 torus; python ray-cast replica agrees on the count."""
    r = qs["join_point_in_polygon"](spark, SF_DIR).first()
    assert 0.0 < r["inside_share"] < 1.0
    verts = [(10, 10), (90, 20), (70, 50), (90, 90), (30, 80),
             (45, 45)]
    edges = list(zip(verts, verts[1:] + verts[:1]))

    def inside(px, py):
        h = 0
        for (x1, y1), (x2, y2) in edges:
            if (y1 > py) != (y2 > py):
                lhs = (px - x1) * (y2 - y1)
                rhs = (py - y1) * (x2 - x1)
                if (y2 > y1 and lhs < rhs) or (y2 < y1 and lhs > rhs):
                    h += 1
        return h % 2 == 1

    import duckdb
    ids = [x[0] for x in duckdb.sql(
        f"SELECT c_custkey FROM read_parquet('{SF_DIR}/customer.parquet')"
    ).fetchall()]
    ref = [i for i in ids if inside(i % 101, i % 103)]
    assert r["n_inside"] == len(ref)
    assert r["inside_id_sum"] == sum(ref)


def test_distance_correlation_bounds(spark, qs):
    """dCor ∈ [0, 1]; count and revenue are strongly dependent, so
    it must be well above 0."""
    r = qs["agg_distance_correlation"](spark, SF_DIR).first()
    assert 0.0 <= r["dcor"] <= 1.0
    assert r["dcor"] > 0.3


def test_energy_distance_nonneg(spark, qs):
    """E ≥ 0 always (it is a metric between distributions); the
    normalized coefficient sits in [0, 1]."""
    r = qs["agg_energy_distance"](spark, SF_DIR).first()
    assert r["energy_dist_usd"] >= 0
    assert 0.0 <= r["energy_coeff"] <= 1.0


def test_mmd_drift_bounds(spark, qs):
    """MMD² ∈ [-small, 4] for a bounded kernel; flag consistent with
    the 4/n threshold."""
    r = qs["dq_mmd_drift"](spark, SF_DIR).first()
    assert -1e-6 <= r["mmd2"] <= 4.0
    assert r["drift_flag"] == (r["mmd2"] > 4.0 / r["n_ref"])


def test_cox_stuart_counts(spark, qs):
    """0 ≤ S+ ≤ m ≤ n/2; flag consistent with 1.96."""
    r = qs["ts_cox_stuart"](spark, SF_DIR).first()
    assert 0 <= r["s_plus"] <= r["n_untied"]
    assert r["trend_5pct"] == (abs(r["z_stat"]) > 1.96)


def test_garman_klass_positive(spark, qs):
    """Volatility positive; annualization is exactly sqrt(252)x."""
    r = qs["win_garman_klass_vol"](spark, SF_DIR).first()
    assert r["gk_daily_vol"] > 0
    assert abs(r["gk_annualized"]
               - r["gk_daily_vol"] * 252 ** 0.5) < 1e-3


def test_erlang_c_monotone(spark, qs):
    """P(wait) is nonincreasing in c, 1 on saturated rows, in [0,1]
    everywhere; stability flag matches rho < 1."""
    rows = sorted(qs["agg_erlang_c"](spark, SF_DIR).collect(),
                  key=lambda r: r["agents"])
    assert len(rows) == 20
    for r in rows:
        assert 0.0 <= r["p_wait"] <= 1.0
        assert r["stable"] == (r["rho"] < 1.0)
        if not r["stable"]:
            assert r["p_wait"] == 1.0
    stable = [r for r in rows if r["stable"]]
    assert all(a["p_wait"] >= b["p_wait"] - 1e-9
               for a, b in zip(stable, stable[1:]))


def test_cucconi_nonneg(spark, qs):
    """C ≥ 0 by construction (positive-definite quadratic form in
    U, V); flag matches the 4.23 gate."""
    r = qs["agg_cucconi_test"](spark, SF_DIR).first()
    assert r["cucconi_c"] >= 0
    assert 0 < r["n_sample2"] < r["n_total"]
    assert r["differ_5pct"] == (r["cucconi_c"] > 4.23)


def test_cochran_armitage_flag(spark, qs):
    """Uniform priorities: |z| finite; flag matches 1.96."""
    r = qs["agg_cochran_armitage"](spark, SF_DIR).first()
    assert abs(r["z_stat"]) < 50
    assert r["trend_5pct"] == (abs(r["z_stat"]) > 1.96)


def test_breslow_day_identities(spark, qs):
    """5 region strata; pooled OR positive; chi2 ≥ 0 with the df=4
    gate applied consistently."""
    r = qs["agg_breslow_day"](spark, SF_DIR).first()
    assert r["n_strata"] == 5
    assert r["or_mh"] > 0
    assert r["bd_chi2"] >= 0
    assert r["heterogeneous_5pct"] == (r["bd_chi2"] > 9.488)


def test_kappa_weighted_bounds(spark, qs):
    """kappa_w ≤ 1; independent raters should sit near 0 (the two
    fixture columns are unrelated by construction)."""
    r = qs["agg_kappa_weighted"](spark, SF_DIR).first()
    assert r["kappa_weighted"] <= 1.0
    assert abs(r["kappa_weighted"]) < 0.5


@pytest.mark.slow
def test_dbscan_labels_consistent(spark, qs):
    """Every point labeled exactly once; cores carry a cluster;
    noise carries none; border clusters reference a core cluster;
    cluster ids are member minima (hence cluster ids are core ids)."""
    rows = qs["sim_dbscan_grid"](spark, SF_DIR).collect()
    roles = {r["vec_id"]: r for r in rows}
    assert len(roles) == len(rows)
    core_clusters = {r["cluster"] for r in rows if r["role"] == "core"}
    for r in rows:
        if r["role"] == "core":
            assert r["cluster"] is not None
            assert r["cluster"] <= r["vec_id"]
        elif r["role"] == "border":
            assert r["cluster"] in core_clusters
        else:
            assert r["cluster"] is None


def test_gif_roundtrip_lossless(spark, qs):
    """GIF is lossless through the palette: decoded checksums equal
    the synthetic formula exactly."""
    import numpy as np
    from pmc_conversion_spark.functions.multimodal import (
        synth_gif_pixels)
    rows = qs["mm_decode_real_gif"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows[:10]:
        px = synth_gif_pixels(r["media_id"], 20, 12)
        wgt = ((np.arange(12)[:, None] + 1)
               * (np.arange(20)[None, :] + 1))
        assert (r["width"], r["height"]) == (20, 12)
        assert r["pix_sum"] == int(px.sum(dtype=np.int64))
        assert r["pix_weighted"] == int(
            (px.astype(np.int64) * wgt).sum())


def test_gif_lzw_edge_cases():
    """From-scratch LZW survives width growth, the KwKwK case, and
    the 4096-table reset (noise forces it); corrupt streams raise."""
    import numpy as np
    import pytest as _pytest
    from pmc_conversion_spark.functions.multimodal import (
        _lzw_compress, _lzw_decompress, decode_gif_gray,
        encode_gif_gray)
    rng = np.random.RandomState(11)
    noise = rng.randint(0, 256, (150, 310)).astype(np.uint8)
    assert (decode_gif_gray(encode_gif_gray(noise)) == noise).all()
    # KwKwK: 'ababab...' style repetition hits the code==len(table) path
    rep = (np.tile(np.array([3, 7], dtype=np.uint8), 500)
           .reshape(20, 50))
    assert (decode_gif_gray(encode_gif_gray(rep)) == rep).all()
    raw = bytes(range(256)) * 4
    assert _lzw_decompress(_lzw_compress(raw, 8), 8) == raw
    with _pytest.raises(ValueError):
        _lzw_decompress(b"\x00", 8)  # ends before EOI


def test_gif_truncated_streams_raise_valueerror():
    """Fail-loud contract (r8 ADVICE #3): EVERY prefix of a valid GIF
    raises ValueError or NotImplementedError — never a raw
    IndexError/struct.error — and so does a stream cut inside a
    sub-block length's promised span."""
    import numpy as np
    import pytest as _pytest
    from pmc_conversion_spark.functions.multimodal import (
        decode_gif_gray, encode_gif_gray)
    px = (np.arange(240, dtype=np.uint8).reshape(12, 20) * 7) % 256
    full = encode_gif_gray(px)
    for cut in range(len(full)):
        with _pytest.raises((ValueError, NotImplementedError)):
            decode_gif_gray(full[:cut])
    # sub-block header promising more bytes than remain
    descr_end = full.index(0x2C) + 10 + 1  # descriptor + mcs byte
    with _pytest.raises(ValueError):
        decode_gif_gray(full[:descr_end] + b"\xff\x01\x02")
    # missing trailer: terminator then EOF
    body_no_trailer = full[:-1]
    with _pytest.raises(ValueError):
        decode_gif_gray(body_no_trailer)
