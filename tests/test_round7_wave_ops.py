"""Invariant tests for the round-7 wave-3+ operators.

The oracle gate already pins value-equality against DuckDB; these pin
the MATHEMATICAL invariants the oracle comparison cannot express (a
wrong-but-identically-wrong implementation would pass the hash check,
not these).
"""

from __future__ import annotations

import math

import pytest

from __spark_entry__ import queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return queries()


def test_matrix_profile_distance_bounds(spark, qs):
    """z-normalized distances live in [0, 2*sqrt(m)]: dist =
    sqrt(2m(1-r)) with r in [-1, 1], so max is sqrt(4m) for m=7."""
    rows = qs["ts_matrix_profile"](spark, SF_DIR).collect()
    assert rows, "empty profile"
    hi = 2.0 * math.sqrt(7.0) + 1e-6
    for r in rows:
        assert 0.0 <= r["nn_dist"] <= hi, r


def test_sample_entropy_template_monotonicity(spark, qs):
    """Adding a third matching coordinate can only REMOVE matches:
    A <= B, so SampEn = -ln(A/B) >= 0."""
    row = qs["ts_sample_entropy"](spark, SF_DIR).first()
    assert row["template_matches_m3"] <= row["template_matches_m2"]
    assert row["sampen"] >= 0.0


def test_competing_risks_partition_of_unity(spark, qs):
    """Aalen-Johansen identity: CIF_R(t) + CIF_A(t) + S(t) = 1 at
    every time point when no cause is censored-only (the 'N' rows
    here never terminate follow-up early, they censor AT their own
    time, so the identity holds to rounding)."""
    rows = qs["agg_competing_risks_cif"](spark, SF_DIR).collect()
    assert rows
    last_err = max(abs(r["cif_returned"] + r["cif_accepted"]
                       + r["km_any_event"] - 1.0) for r in rows)
    assert last_err < 1e-3, last_err
    # both CIFs are nondecreasing in t
    srt = sorted(rows, key=lambda r: r["t_days"])
    for a, b in zip(srt, srt[1:]):
        assert b["cif_returned"] >= a["cif_returned"] - 1e-9
        assert b["cif_accepted"] >= a["cif_accepted"] - 1e-9


def test_ransac_consensus_beats_minimum(spark, qs):
    """The winning candidate passes through its own two defining
    points, so it has at least 2 inliers; the fraction is in (0,1]."""
    row = qs["agg_ransac_line"](spark, SF_DIR).first()
    assert row["n_inliers"] >= 2
    assert 0.0 < row["inlier_frac"] <= 1.0


def test_mmr_first_pick_is_pure_relevance(spark, qs):
    """Step 1 has an empty selected set, so its score is the raw
    top relevance — a cosine, hence within [-1, 1]; later steps are
    penalized so per-query scores are nonincreasing."""
    rows = qs["sim_mmr_rerank"](spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["step"]] = r
    for q, steps in by_q.items():
        assert set(steps) == {1, 2, 3}
        assert -1.0 <= steps[1]["mmr_score"] <= 1.0
        assert steps[2]["mmr_score"] <= steps[1]["mmr_score"] + 1e-9
        # selections are distinct
        sels = {s["selected_id"] for s in steps.values()}
        assert len(sels) == 3


@pytest.mark.slow
def test_maxsim_dominates_any_single_subvector(spark, qs):
    """MaxSim sums four per-sub maxima of cosines, each in [-1, 1],
    so the score lives in [-4, 4]; ranks are 1..3 per query."""
    rows = qs["sim_maxsim_multivector"](spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        assert -4.0 <= r["maxsim_score"] <= 4.0
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == [1, 2, 3]


def test_dtw_self_distance_is_zero(spark, qs):
    """DTW lower bound: every distance >= 0, and the normalized form
    is bounded by the worst per-cell cost (1/52 of max share gap)."""
    rows = qs["ts_dtw_distance"](spark, SF_DIR).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["dtw_dist"] >= 0
        assert 0.0 <= r["dtw_norm"] <= 2.0


def test_eigencentrality_normalized_to_sup_one(spark, qs):
    """Sup-norm scaling: max centrality is exactly 1 (the hub), all
    values in (0, 1]."""
    rows = qs["graph_eigencentrality_power"](spark, SF_DIR).collect()
    vals = [r["eigencentrality"] for r in rows]
    assert vals and max(vals) == pytest.approx(1.0, abs=1e-6)
    assert all(0.0 < v <= 1.0 + 1e-9 for v in vals)


def test_power_iteration_eigenpair_consistency(spark, qs):
    """The leading eigenvalue of a 3x3 CORRELATION matrix lies in
    [1 - something small, 3]; the eigenvector is unit-norm."""
    row = qs["agg_power_iteration_eig3"](spark, SF_DIR).first()
    assert 0.5 <= row["lambda1"] <= 3.0 + 1e-9
    nrm = math.sqrt(row["evec_quantity"] ** 2 + row["evec_price"] ** 2
                    + row["evec_discount"] ** 2)
    assert nrm == pytest.approx(1.0, abs=1e-4)


def test_variance_components_icc_in_unit_interval(spark, qs):
    row = qs["agg_variance_components"](spark, SF_DIR).first()
    assert row["sigma2_within_dollars2"] > 0
    assert -1.0 <= row["icc"] <= 1.0


def test_garch_peak_dominates_last(spark, qs):
    rows = qs["ts_garch11_filter"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["sigma2_peak"] >= r["sigma2_last"] - 1e-9
        assert r["sigma2_last"] >= 0.0


def test_cep_matches_bounded_by_purchases(spark, qs):
    rows = qs["stream_cep_followed_by"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_matched"] <= r["n_purchases"]


def test_slice_finder_is_deterministic_topk(spark, qs):
    a = qs["dq_slice_finder"](spark, SF_DIR).collect()
    b = qs["dq_slice_finder"](spark, SF_DIR).collect()
    assert a == b
    assert len(a) <= 10
    assert all(r["n"] >= 100 for r in a)


def test_spectral_entropy_normalized(spark, qs):
    row = qs["ts_spectral_entropy"](spark, SF_DIR).first()
    assert 0.0 <= row["spectral_entropy_norm"] <= 1.0 + 1e-9
    assert 0.0 < row["spectral_flatness"] <= 1.0 + 1e-9
    assert 1 <= row["peak_harmonic"] <= 16


def test_hill_numbers_are_ordered(spark, qs):
    """Hill diversity is nonincreasing in q: q0 >= q1 >= q2 >= 1."""
    row = qs["agg_diversity_hill"](spark, SF_DIR).first()
    assert row["hill_q0"] >= row["hill_q1"] >= row["hill_q2"] >= 1.0
    assert 0.0 <= row["pielou_evenness"] <= 1.0 + 1e-9


def test_tukey_biweight_within_data_hull(spark, qs):
    """A weighted mean of observed values stays inside their range;
    the bisquare location should also sit near the median relative
    to the MAD scale."""
    row = qs["agg_tukey_biweight"](spark, SF_DIR).first()
    assert row["n_unclipped"] > 0
    assert abs(row["biweight_location_dollars"]
               - row["median_dollars"]) <= 6.0 * row["mad_dollars"]
