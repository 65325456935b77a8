"""Edge-case tests for waves 211-224: RCA positivity, GMM ranges, EB
posterior ranges, Otsu bounds, isotonic monotonicity, concentration-bound
ordering, watermark null behavior, LDA scores, harmonic R², ICC bounds,
Self-BLEU/Distinct ranges, HMM filter ranges, STTR bounds, scan-statistic
window order, RSI bounds, matrix-profile motif<=discord, IPF gap, KNN-
Shapley shape, burstiness/memory ranges, TE/Granger non-negativity, AD
positivity, triplet-margin counts, HITS norms, JSD bounds, circular stats,
hedonic decomposition. Value contracts are enforced by the parametrized
oracle gate; these pin semantics."""

import numpy as np
import pandas as pd

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _run(name, path=SF):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def test_rca_positive_topk():
    got = _run("supplier_rca_index")
    assert len(got) <= 10
    assert (got["rca_micro"] > 0).all()
    assert (np.diff(got["rca_micro"].to_numpy()) <= 0).all()


def test_gmm_ranges():
    got = _run("customer_gmm_em")
    assert got["pi1_micro"].between(0, 1_000_000).all()
    assert (got["sigma1_micro"] > 0).all()
    assert (got["sigma2_micro"] > 0).all()


def test_eb_rates_ranges():
    got = _run("users_eb_rates")
    assert got["post_micro"].between(0, 1_000_000).all()
    assert (got["alpha_micro"] > 0).all()
    assert (np.diff(got["post_micro"].to_numpy()) <= 0).all()


def test_otsu_bounds():
    got = _run("events_otsu_threshold")
    assert got["t_bin"].between(1, 99).all()
    assert got["frac_above_micro"].between(0, 1_000_000).all()


def test_isotonic_monotone():
    got = _run("events_isotonic_fit")
    assert (got["fit_first_micro"] <= got["fit_last_micro"]).all()
    assert (got["n_levels"] <= got["n_days"]).all()
    assert (got["sse_int"] >= 0).all()


def test_concentration_ordering():
    got = _run("orders_concentration_bounds")
    # Hoeffding with support [0, R] is always wider than the CLT interval
    assert (got["hoeffding_hw_micro"] >= got["clt_hw_micro"]).all()
    assert (got["hoeffding_over_clt_micro"] >= 1_000_000).all()


def test_watermark_null_behavior():
    got = _run("docs_watermark_score")
    # unwatermarked synthetic text: no source should trip the z > 4 flag
    assert (got["flagged"] == 0).all()
    assert (got["n_green"] <= got["n_bigrams"]).all()


def test_diag_lda_scores():
    got = _run("emb_diag_lda", "/root/testdata/sf0.01")
    assert len(got) == 5
    assert (got["score_micro"] >= 0).all()
    assert (np.diff(got["score_micro"].to_numpy()) <= 0).all()


def test_harmonic_ranges():
    got = _run("events_harmonic_regression")
    assert got["r2_micro"].between(0, 1_000_000).all()
    assert (got["amp_micro"] >= 0).all()


def test_icc_bounds():
    got = _run("orders_icc")
    if len(got):
        assert int(got["icc_micro"].iloc[0]) <= 1_000_000


def test_self_bleu_and_distinct():
    sb = _run("docs_self_bleu")
    assert sb["self_bleu_micro"].between(0, 1_000_000).all()
    dn = _run("docs_distinct_n")
    assert dn["distinct1_micro"].between(0, 1_000_000).all()
    assert (dn["n_bigrams"] < dn["n_tokens"]).all()


def test_hmm_ranges():
    got = _run("events_hmm_forward")
    assert got["p_high_final_micro"].between(0, 1_000_000).all()
    assert (got["loglik_micro"] < 0).all()


def test_sttr_bounds():
    got = _run("docs_sttr")
    assert got["sttr_micro"].between(1, 1_000_000).all()
    assert (got["n_windows"] >= 1).all()


def test_scan_window_order():
    got = _run("events_scan_statistic")
    assert (got["s_day"] <= got["e_day"]).all()
    assert (got["llr_micro"] > 0).all()


def test_rsi_bounds():
    got = _run("orders_rsi14")
    if len(got):
        assert 0 <= int(got["last_rsi_micro"].iloc[0]) <= 100_000_000


def test_matrix_profile_motif_le_discord():
    got = _run("events_matrix_profile")
    assert (got["motif_dist_micro"] <= got["discord_dist_micro"]).all()
    assert (got["motif_i_day"] != got["motif_j_day"]).all()


def test_ipf_gap_and_weights():
    got = _run("customer_ipf_raking")
    assert (got["weight_micro"] > 0).all()
    assert (got["gap_micro"] >= 0).all()


def test_knn_shapley_shape():
    got = _run("emb_knn_shapley", "/root/testdata/sf0.01")
    assert len(got) == 15
    assert set(got["rank"]) == {1, 2, 3}
    assert got["query_id"].nunique() == 5


def test_burstiness_ranges():
    got = _run("events_burstiness_goh")
    assert got["b_micro"].between(-1_000_000, 1_000_000).all()
    assert got["m_micro"].between(-1_000_001, 1_000_001).all()


def test_te_and_granger_nonnegative():
    te = _run("events_transfer_entropy")
    assert (te["te_micro"] >= 0).all()
    gf = _run("events_granger_f")
    assert (gf["f_micro"] >= 0).all()


def test_anderson_darling_positive():
    got = _run("events_anderson_darling")
    assert (got["a2_micro"] > 0).all()
    assert got["reject_5pct"].isin([0, 1]).all()


def test_triplet_margin_counts():
    got = _run("emb_triplet_margin", "/root/testdata/sf0.01")
    assert (got["n_violations"] <= got["n_anchors"]).all()


def test_hits_normalized():
    got = _run("nation_hits")
    assert got["authority_micro"].between(0, 1_000_001).all()
    assert len(got) <= 5


def test_jsd_bounds():
    got = _run("docs_jsd_pairs")
    # JSD in nats is bounded by ln 2
    assert got["jsd_micro"].between(0, 693_148).all()
    assert (got["s1"] < got["s2"]).all()


def test_circular_ranges():
    got = _run("events_circular_stats")
    assert got["r_micro"].between(0, 1_000_000).all()
    assert (got["rayleigh_z_micro"] >= 0).all()


def test_hedonic_decomposition():
    got = _run("part_hedonic_within")
    if len(got):
        assert int(got["n_brands"].iloc[0]) > 0
