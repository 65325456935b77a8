"""Edge-case tests for waves 235-251: Theil-Sen pair counts, cross-entropy
vs perplexity consistency, keyness ranking, Pettitt p bounds, cluster-validity
positivity, DBSCAN partition closure, Flesch component positivity, quantile
regression loss ordering, Kruskal-Wallis tie-correction direction,
Durbin-Watson range, Ljung-Box monotonicity, Jarque-Bera rejection rule,
McNemar continuity correction, Theil's U bounds, Cochran-Armitage rejection,
Brier Murphy decomposition, Kuiper bounds, Somers' D bounds, Friedman
positivity, Brown-Forsythe positivity, CvM/Lilliefors positivity,
temperature-mix weight closure, sequence-packing capacity accounting,
SemDeDup keep counts, split novelty bounds, window-funnel monotonicity,
rolling-distinct dominance, GESD round structure, Dixon Q bounds,
Jonckheere z consistency, seasonal-strength bounds, Hodges-Lehmann Walsh
count, sign-test p bounds. Value contracts are enforced by the parametrized
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


# ---- wave 235 ----

def test_theil_sen_pair_counts():
    got = _run("events_theil_sen")
    assert len(got) > 0
    n = got["n_days"].to_numpy(np.int64)
    assert (got["n_pairs"].to_numpy(np.int64) == n * (n - 1) // 2).all()
    assert (n >= 5).all()


def test_unigram_ce_ppl_consistent():
    got = _run("docs_unigram_ce")
    assert len(got) > 0
    # ppl = e^ce, both floored micro — consistency within rounding
    ce = got["ce_micro"].to_numpy(np.float64) / 1e6
    ppl = got["ppl_micro"].to_numpy(np.float64) / 1e6
    assert np.allclose(np.exp(ce), ppl, rtol=1e-4)
    assert (got["ce_micro"] > 0).all()


# ---- wave 236 ----

def test_keyness_rank_structure():
    got = _run("docs_keyness")
    assert len(got) > 0
    for _, sub in got.groupby("source"):
        r = sub.sort_values("rank")
        assert list(r["rank"]) == list(range(1, len(r) + 1))
        # ranked by G2 desc (floored micro is engine-stable)
        g2 = r["g2_micro"].to_numpy(np.int64)
        assert (np.diff(g2) <= 0).all()
    assert (got["n_in"] > 0).all()


def test_pettitt_bounds():
    got = _run("events_pettitt")
    assert len(got) == 1
    assert got["p_micro"].between(0, 1_000_000).all()
    assert (got["k_stat"] >= 0).all()
    n = int(got["n_days"].iloc[0])
    # change point is an interior split 1..n-1
    # (change_day is the calendar day at split index, so just sanity: K <= n^2/4ish)
    assert int(got["k_stat"].iloc[0]) <= n * n


# ---- wave 237 ----

def test_cluster_validity_positive():
    got = _run("emb_cluster_validity")
    assert len(got) == 1
    assert int(got["k"].iloc[0]) >= 2
    assert (got["ch_micro"] > 0).all()
    assert (got["db_micro"] > 0).all()


def test_dbscan_partition_closure():
    got = _run("emb_dbscan", "/root/testdata/sf0.01")
    if got.empty:
        return  # < sample size at this sf
    # noise count is constant across cluster rows
    assert got["n_noise"].nunique() == 1
    assert (got["n_core"] >= 1).all()
    total = int((got["n_core"] + got["n_border"]).sum()
                + got["n_noise"].iloc[0])
    assert total == 200  # the documented sample size partitions exactly


# ---- wave 238 ----

def test_flesch_components_positive():
    got = _run("docs_flesch")
    assert len(got) > 0
    assert (got["n_words"] > 0).all()
    # every word contributes >= 1 syllable by the max(1, runs) rule
    assert (got["n_syllables"] >= got["n_words"]).all()


def test_quantile_regression_taus():
    got = _run("lineitem_quantile_regression")
    assert sorted(got["tau_milli"]) == [500, 900]
    assert (got["slope_micro"] > 0).all()
    assert (got["loss_int"] > 0).all()
    # the 0.9-quantile slope dominates the median slope for price/qty ratios
    g = got.set_index("tau_milli")
    assert g.loc[900, "slope_micro"] >= g.loc[500, "slope_micro"]


# ---- wave 239 ----

def test_kruskal_wallis_tie_correction_direction():
    got = _run("events_kruskal_wallis")
    assert len(got) == 1
    # tie correction divides by (1 - T) <= 1, so H' >= H
    assert int(got["h_tie_micro"].iloc[0]) >= int(got["h_micro"].iloc[0])
    assert int(got["k"].iloc[0]) >= 2


def test_durbin_watson_range():
    got = _run("events_durbin_watson")
    assert len(got) > 0
    assert got["dw_micro"].between(0, 4_000_000).all()


# ---- wave 240 ----

def test_ljung_box_lags():
    got = _run("events_ljung_box")
    assert list(got["lag"]) == list(range(1, 8))
    # Q(k) is a cumulative sum of nonnegative terms -> nondecreasing
    q = got.sort_values("lag")["q_micro"].to_numpy(np.int64)
    assert (np.diff(q) >= -1).all()  # -1 absorbs micro-floor jitter
    assert got["acf_micro"].between(-1_000_000, 1_000_000).all()


def test_jarque_bera_rejection_rule():
    got = _run("orders_jarque_bera")
    assert len(got) > 0
    jb = got["jb_micro"].to_numpy(np.int64)
    rej = got["reject_5pct"].to_numpy(np.int64)
    assert ((jb > 5_991_500) == (rej == 1)).all()


# ---- wave 241 ----

def test_mcnemar_continuity_correction():
    got = _run("docs_mcnemar")
    assert len(got) == 1
    # continuity correction never increases the statistic
    assert int(got["chi2_cc_micro"].iloc[0]) <= int(got["chi2_micro"].iloc[0])
    assert got["reject_5pct"].isin([0, 1]).all()


def test_theil_u_bounds():
    got = _run("events_theil_u")
    assert len(got) == 1
    assert got["u_type_given_dow_micro"].between(0, 1_000_000).all()
    assert got["u_dow_given_type_micro"].between(0, 1_000_000).all()
    assert (got["h_type_micro"] > 0).all()


# ---- wave 242 ----

def test_cochran_armitage_rejection():
    got = _run("lineitem_cochran_armitage")
    assert len(got) == 1
    z = abs(int(got["z_micro"].iloc[0]))
    rej = int(got["reject_5pct"].iloc[0])
    assert (z > 1_960_000) == (rej == 1)
    assert int(got["n_bands"].iloc[0]) >= 2


def test_brier_murphy_decomposition():
    got = _run("lineitem_brier_calibration")
    assert len(got) > 0
    # decomposition constants are per-table (identical across band rows)
    for c in ("rel_micro", "res_micro", "unc_micro"):
        assert got[c].nunique() == 1
    assert got["f_micro"].between(0, 1_000_000).all()
    assert got["o_micro"].between(0, 1_000_000).all()
    # BS = unc - res + rel within micro rounding
    bs = int(got["brier_micro"].iloc[0])
    parts = (int(got["unc_micro"].iloc[0]) - int(got["res_micro"].iloc[0])
             + int(got["rel_micro"].iloc[0]))
    assert abs(bs - parts) <= 3


# ---- wave 243 ----

def test_kuiper_bounds():
    got = _run("events_kuiper")
    assert len(got) > 0
    # V = D+ + D- lives in (0, 2)
    assert got["v_micro"].between(0, 2_000_000).all()
    assert (got["vstat_micro"] >= got["v_micro"]).all()  # multiplier > 1 here


def test_somers_d_bounds():
    got = _run("lineitem_somers_d")
    assert len(got) == 1
    assert got["d_yx_micro"].between(-1_000_000, 1_000_000).all()
    assert got["d_xy_micro"].between(-1_000_000, 1_000_000).all()
    # both share the numerator C-D, so they share sign
    assert (np.sign(got["d_yx_micro"]) == np.sign(got["d_xy_micro"])).all()


# ---- wave 244 ----

def test_friedman_positive():
    got = _run("events_friedman")
    assert len(got) == 1
    assert int(got["chi2_micro"].iloc[0]) >= 0
    assert int(got["k"].iloc[0]) >= 2
    assert int(got["n_blocks"].iloc[0]) >= 1


def test_brown_forsythe_positive():
    got = _run("events_brown_forsythe")
    assert len(got) == 1
    assert int(got["f_micro"].iloc[0]) >= 0
    assert int(got["k"].iloc[0]) >= 2


# ---- wave 245 ----

def test_cvm_positive():
    got = _run("orders_cvm_normality")
    assert len(got) > 0
    # W^2 >= 1/(12n) > 0
    assert (got["w2_micro"] > 0).all()
    assert (got["n"] >= 8).all()


def test_lilliefors_consistent():
    got = _run("orders_lilliefors")
    assert len(got) > 0
    assert (got["d_micro"] > 0).all()
    d = got["d_micro"].to_numpy(np.float64) / 1e6
    dsn = got["dsqrtn_micro"].to_numpy(np.float64) / 1e6
    n = got["n"].to_numpy(np.float64)
    assert np.allclose(d * np.sqrt(n), dsn, rtol=1e-3)


# ---- wave 246 ----

def test_temperature_mix_weight_closure():
    got = _run("docs_temperature_mix")
    assert sorted(got["alpha_milli"].unique()) == [300, 500, 700]
    for _, sub in got.groupby("alpha_milli"):
        s = int(sub["weight_micro"].sum())
        assert abs(s - 1_000_000) <= len(sub)  # floor jitter per source
        assert abs(int(sub["budget_tokens"].sum()) - 1_000_000) <= len(sub)
    # smaller alpha flattens: the max weight shrinks as alpha drops
    mx = got.groupby("alpha_milli")["weight_micro"].max()
    assert mx.loc[300] <= mx.loc[500] <= mx.loc[700]


def test_seq_packing_accounting():
    got = _run("docs_seq_packing")
    assert len(got) > 0
    assert (got["n_bins"] >= 1).all()
    assert (got["n_bins"] <= got["n_docs"]).all()
    # without oversize docs, efficiency <= 1
    no_over = got[got["n_oversize"] == 0]
    assert no_over["efficiency_micro"].le(1_000_000).all()


# ---- wave 247 ----

def test_semdedup_keep_counts():
    got = _run("emb_semdedup_prune")
    assert len(got) > 0
    n = got["n"].to_numpy(np.int64)
    kept = got["n_kept"].to_numpy(np.int64)
    assert (kept == (n + 1) // 2).all()
    assert (got["cut_d2q"] >= 0).all()


def test_split_novelty_bounds():
    got = _run("docs_split_novelty")
    assert len(got) > 0
    assert (got["n_novel"] <= got["n_test_grams"]).all()
    assert got["novelty_micro"].between(0, 1_000_000).all()


# ---- wave 248 ----

def test_window_funnel_monotone():
    got = _run("events_window_funnel")
    assert len(got) > 0
    g = got.sort_values("level")
    # n_users at level L counts users with max level >= L -> nonincreasing
    assert (np.diff(g["n_users"].to_numpy(np.int64)) <= 0).all()
    assert set(g["level"]) <= {1, 2, 3}


def test_rolling_distinct_dominance():
    got = _run("events_rolling_distinct")
    assert len(got) > 0
    assert (got["n_users_7d"] >= got["n_users_day"]).all()
    assert (got["n_new_users"] <= got["n_users_day"]).all()
    # total new users across days = total distinct users ever active
    assert int(got["n_new_users"].sum()) >= int(got["n_users_day"].max())


# ---- wave 249 ----

def test_gesd_round_structure():
    got = _run("events_gesd")
    if got.empty:
        return
    g = got.sort_values("round")
    assert list(g["round"]) == list(range(1, len(g) + 1))
    # each round removes exactly one day
    rem = g["n_remaining"].to_numpy(np.int64)
    assert (np.diff(rem) == -1).all()
    assert (g["r_micro"] > 0).all()


def test_dixon_q_bounds():
    got = _run("events_dixon_q")
    assert len(got) > 0
    assert got["q_high_micro"].between(0, 1_000_000).all()
    assert got["q_low_micro"].between(0, 1_000_000).all()
    assert (got["n_days"] >= 4).all()


# ---- wave 250 ----

def test_jonckheere_z_consistency():
    got = _run("lineitem_jonckheere")
    assert len(got) == 1
    jt = int(got["jt_int"].iloc[0])
    e = int(got["e_int"].iloc[0])
    z = int(got["z_micro"].iloc[0])
    assert (z > 0) == (jt > e) or z == 0
    assert int(got["n_bands"].iloc[0]) >= 2


def test_seasonal_strength_bounds():
    got = _run("events_seasonal_strength", "/root/testdata/sf0.01")
    if got.empty:
        return
    assert got["fs_micro"].between(0, 1_000_000).all()
    assert got["trend_strength_micro"].between(0, 1_000_000).all()
    assert (got["n_valid"] <= got["n_days"]).all()


# ---- wave 251 ----

def test_hodges_lehmann_walsh_count():
    got = _run("events_hodges_lehmann")
    assert len(got) > 0
    n = got["n_days"].to_numpy(np.int64)
    assert (got["n_walsh"].to_numpy(np.int64) == n * (n + 1) // 2).all()


def test_sign_test_bounds():
    got = _run("events_sign_test")
    assert len(got) > 0
    assert got["p_micro"].between(0, 1_000_000).all()
    assert (got["s"] <= got["m"]).all()
    # balanced signs give p = 1 (min with 1 clamps)
    assert (got["m"] >= 5).all()
