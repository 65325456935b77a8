"""Edge-case tests for waves 225-234: Oaxaca additivity, coherence/phase
bounds, kappa cell-count closure, CKA bounds, MMD sizes, polarity bounds,
Atkinson epsilon-monotonicity, Weibull positivity, ADF stationarity flags,
ABC transition labels, halving survivor shrinkage, dominance gap sign,
secretary observation-window order, EVT ES>=VaR, Hurst positivity, RQA rate
bounds, OU mean-reversion range, Benford arc bounds, halves-coherence
bounds, alignment/uniformity signs. Value contracts are enforced by the
parametrized oracle gate; these pin semantics."""

import numpy as np
import pandas as pd

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _run(name, path=SF):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def test_oaxaca_additivity():
    got = _run("orders_oaxaca")
    assert len(got) == 1
    assert int(got["n_a"].iloc[0]) > 0 and int(got["n_b"].iloc[0]) > 0
    gap = int(got["gap_micro"].iloc[0])
    parts = int(got["explained_micro"].iloc[0]) + int(
        got["unexplained_micro"].iloc[0]
    )
    assert abs(gap - parts) <= 2  # micro-rounding of the two components


def test_weekly_coherence_bounds():
    got = _run("events_weekly_coherence")
    assert got["coh_micro"].between(0, 1_000_000).all()
    # phase of a cross-spectrum lives on (-pi, pi]
    assert got["phase_micro"].between(-3_141_593, 3_141_593).all()
    assert (got["x_type"] < got["y_type"]).all()


def test_filter_kappa_cells_close():
    got = _run("docs_filter_kappa")
    cells = got[["n11", "n00", "n10", "n01"]].sum(axis=1)
    assert (cells == got["n"]).all()
    assert got["kappa_micro"].between(-1_000_000, 1_000_000).all()


def test_cka_bounds():
    got = _run("emb_cka_halves")
    assert got["cka_micro"].between(0, 1_000_000).all()


def test_mmd_sizes():
    got = _run("emb_mmd_poly")
    assert (got["n0"] > 0).all() and (got["n1"] > 0).all()
    assert len(got) == 1


def test_lexicon_polarity_bounds():
    got = _run("docs_lexicon_polarity")
    assert got["polarity_micro"].between(-1_000_000, 1_000_000).all()
    assert ((got["n_pos"] + got["n_neg"]) > 0).all()


def test_atkinson_monotone_in_epsilon():
    got = _run("orders_atkinson_index")
    # Atkinson index is nondecreasing in the inequality-aversion epsilon
    assert (got["atkinson_half_micro"] <= got["atkinson_two_micro"]).all()
    assert got["atkinson_two_micro"].between(0, 1_000_000).all()


def test_weibull_fit_positive():
    got = _run("orders_weibull_plot_fit")
    assert (got["shape_micro"] > 0).all()
    assert (got["scale_micro"] > 0).all()
    assert got["r2_micro"].between(0, 1_000_000).all()


def test_dickey_fuller_flags():
    got = _run("events_dickey_fuller")
    assert got["stationary"].isin([0, 1]).all()
    # the ADF t-stat and the lag-coefficient share sign by construction
    sign_match = np.sign(got["beta_micro"]) == np.sign(got["df_t_micro"])
    assert (sign_match | (got["beta_micro"] == 0)).all()


def test_abc_transition_labels():
    got = _run("parts_abc_transitions")
    # 'N' marks a part absent from that year's shipments
    assert set(got["class_from"]) <= {"A", "B", "C", "N"}
    assert set(got["class_to"]) <= {"A", "B", "C", "N"}
    # a part cannot be absent in both years and still appear
    assert not ((got["class_from"] == "N") & (got["class_to"] == "N")).any()
    assert (got["n_parts"] > 0).all()


def test_successive_halving_shrinks():
    got = _run("events_successive_halving")
    surv = got.groupby("round")["survived"].sum().sort_index()
    arms = got.groupby("round").size().sort_index()
    # each round keeps ceil(k/2) arms, and the next round fields exactly them
    for r in surv.index[:-1]:
        assert arms.get(r + 1, 0) == surv[r]
    assert (surv <= arms).all()


def test_stochastic_dominance_gap():
    got = _run("orders_stochastic_dominance")
    assert (got["max_gap_micro"] >= 0).all()
    assert got["dominates"].isin([0, 1]).all()


def test_secretary_window_order():
    got = _run("events_secretary_rule")
    assert (got["r_observe"] < got["n_days"]).all()
    assert (got["r_observe"] >= 1).all()
    assert got["is_best"].isin([0, 1]).all()


def test_evt_es_dominates_var():
    got = _run("events_evt_var")
    assert (got["es99_micro"] >= got["var99_micro"]).all()
    assert (got["n_exceed"] > 0).all()


def test_hurst_positive():
    got = _run("events_hurst_rs", "/root/testdata/sf0.01")
    assert len(got) > 0
    assert (got["hurst_micro"] > 0).all()
    assert (got["n_sizes"] >= 2).all()


def test_rqa_bounds():
    got = _run("events_recurrence_quantification")
    assert got["rr_micro"].between(0, 1_000_000).all()
    assert got["det_micro"].between(0, 1_000_000).all()
    assert (got["n_rec"] <= got["n_days"] * got["n_days"]).all()


def test_ou_mean_reversion_range():
    got = _run("events_ou_halflife")
    # rows only exist where 0 < rho < 1 (otherwise no reversion to report)
    assert got["rho_micro"].between(1, 999_999).all()
    assert (got["halflife_micro"] > 0).all()


def test_mantissa_arc_bounds():
    got = _run("lineitem_mantissa_arc")
    assert got["center_norm_micro"].between(0, 1_000_000).all()
    assert (got["arc_stat_micro"] >= 0).all()
    assert got["benford_reject"].isin([0, 1]).all()


def test_halves_coherence_bounds():
    got = _run("docs_halves_coherence")
    assert got["coherence_micro"].between(0, 1_000_000).all()
    assert (got["n_docs"] > 0).all()


def test_alignment_uniformity_signs():
    got = _run("emb_alignment_uniformity")
    # alignment is a mean squared distance; uniformity is ln of a mean of
    # exp(-2 d^2) terms each <= 1, so it is never positive
    assert (got["alignment_micro"] >= 0).all()
    assert (got["uniformity_micro"] <= 0).all()
