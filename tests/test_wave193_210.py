"""Edge-case tests for waves 193-210: Good-Turing hand case, Chow segments,
b-bit estimate bounds, EMD non-negativity, IPW/priority-sample invariants,
SPRT decision consistency, NN-matching bounds, BH monotonicity, exp-GOF
bounds, FD-discovery consistency, t-closeness bounds, WOE IV sign, median
polish shape, theta-sketch set laws, AQP bounds, gains monotonicity + AUC
range, SRM flag consistency, greedy-coverage monotonicity, extremal index,
Bayes AB ranges, Newey-West ratio, Kalman hand case, reserve-price shape,
James-Stein contraction, energy-distance sign, Shapley exposure, gravity
plausibility, GARCH max>=final, Bass shape, selectivity top-k, m-of-n
consistency, USL positivity, profile-similarity bounds. Value contracts are
enforced by the parametrized oracle gate; these pin semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _run(name, path=SF):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def _write_events(tmp_path, ts, users=None, types=None, values=None):
    n = len(ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": (
                np.asarray(users, dtype=np.int64)
                if users is not None
                else np.ones(n, dtype=np.int64)
            ),
            "event_type": types if types is not None else ["x"] * n,
            "value": (
                np.asarray(values, dtype=np.float64)
                if values is not None
                else np.ones(n)
            ),
            "props": ['{"k": 1}'] * n,
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/events.parquet")


def _write_docs(tmp_path, texts):
    n = len(texts)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * n,
            "source": ["src0"] * n,
            "n_chars": np.array([len(t) for t in texts], np.int64),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/documents.parquet")


def test_good_turing_hand_case(tmp_path):
    # counts: a:2, b:1, c:1 -> n1=2, n2=1; r*=1 at r=1; P0 = 2/4
    _write_docs(tmp_path, ["a a b c"])
    got = _run("docs_good_turing", tmp_path).set_index("r")
    assert int(got.loc[1, "n_r"]) == 2
    assert int(got.loc[1, "n_next"]) == 1
    assert int(got.loc[1, "rstar_micro"]) == 1_000_000
    assert int(got.loc[1, "p0_micro"]) == 500_000
    assert int(got.loc[2, "rstar_micro"]) == 0


def test_chow_has_two_segments():
    got = _run("lineitem_chow_test")
    assert len(got) == 1
    assert int(got["n1"].iloc[0]) > 0 and int(got["n2"].iloc[0]) > 0


def test_bbit_estimates_bounded():
    got = _run("docs_bbit_minhash")
    assert (got["est_full_micro"] >= 300_000).all()
    assert got["est_1bit_micro"].between(-1_000_000, 1_000_000).all()


def test_emd_nonnegative():
    got = _run("orders_emd_by_segment")
    assert (got["emd_micro"] >= 0).all()


def test_ipw_and_priority_sample():
    ipw = _run("events_ipw_ate")
    assert (ipw["n_used"] > 0).all()
    ps = _run("events_priority_sample")
    assert (ps["est_w"] > 0).all()
    assert (ps["err_micro"] >= 0).all()
    # exact when a type has <= 64 items
    small = ps[ps["n_items"] <= 64]
    assert (small["est_w"] == small["total_w"]).all()


def test_sprt_decision_consistency():
    got = _run("events_sprt")
    assert set(got["decision"]).issubset({"h0", "h1", "continue"})
    cont = got[got["decision"] == "continue"]
    assert (cont["decision_day"] == 0).all()
    dec = got[got["decision"] != "continue"]
    assert (dec["decision_day"] > 0).all()


def test_nn_matching_bounds():
    got = _run("customer_nn_matching")
    assert int(got["n_matched"].iloc[0]) > 0
    assert int(got["mean_dist_micro"].iloc[0]) >= 0


def test_bh_q_dominates_p():
    got = _run("events_bh_fdr")
    assert (got["q_micro"] >= got["p_micro"]).all()
    assert got["reject"].isin([0, 1]).all()


def test_exp_gof_bounds():
    got = _run("events_exp_gof")
    assert (got["lambda_micro"] > 0).all()
    assert got["ks_d_micro"].between(0, 1_000_000).all()


def test_fd_discovery_consistency():
    got = _run("part_fd_discovery")
    assert (got["conf_micro"] <= 1_000_000).all()
    holds = got[got["holds"] == 1]
    assert (holds["n_violations"] == 0).all()


def test_t_closeness_bounds():
    got = _run("customer_t_closeness")
    assert got["max_t_micro"].between(0, 1_000_000).all()


def test_woe_iv_nonnegative():
    got = _run("customer_woe_iv")
    if len(got):
        assert (got["iv_micro"] >= 0).all()


def test_median_polish_shape():
    got = _run("events_median_polish")
    assert set(got["kind"]) == {"row", "col"}
    assert len(got[got["kind"] == "row"]) == 7


def test_theta_setops_laws():
    got = _run("events_theta_setops")
    assert (got["exact_inter"] <= got["exact_union"]).all()
    assert (got["est_union"] >= 0).all()


def test_aqp_bounds():
    got = _run("lineitem_aqp_audit")
    assert (got["n_sample"] <= got["n_pop"]).all()
    assert (got["halfwidth"] >= 0).all()


def test_gains_monotone_auc_range():
    got = _run("customer_gains_auc")
    g = got["gain_micro"].to_numpy()
    assert (np.diff(g) >= 0).all()
    assert int(g[-1]) == 1_000_000
    assert got["auc_micro"].between(0, 1_000_000).all()


def test_srm_flag_consistency():
    got = _run("events_srm_check")
    flag = got["srm_flag"].to_numpy()
    chi = got["chi2_micro"].to_numpy()
    assert ((chi > 3_840_000) == (flag == 1)).all()


def test_greedy_coverage_monotone():
    got = _run("docs_greedy_coverage")
    assert (np.diff(got["gain"].to_numpy()) <= 0).all()
    assert (np.diff(got["covered_total"].to_numpy()) >= 0).all()
    assert got["doc_id"].is_unique


def test_extremal_index_bounds():
    got = _run("events_extremal_index")
    assert (got["n_clusters"] <= got["n_exceed"]).all()
    assert got["theta_micro"].between(0, 1_000_000).all()


def test_bayes_ab_ranges():
    got = _run("events_bayes_ab")
    assert got["prob_micro"].between(0, 1_000_000).all()
    assert got["m0_micro"].between(0, 1_000_000).all()


def test_newey_west_ratio_positive():
    got = _run("events_newey_west")
    assert (got["ratio_micro"] > 0).all()


def test_kalman_constant_series(tmp_path):
    # constant daily counts -> zero innovations, level == count, rmse == 0
    ts = ["2024-01-01"] * 10 + ["2024-01-02"] * 10 + ["2024-01-03"] * 10
    _write_events(tmp_path, ts=ts)
    got = _run("events_kalman_filter", tmp_path)
    assert int(got["level_micro"].iloc[0]) == 10_000_000
    assert int(got["rmse_micro"].iloc[0]) == 0


def test_reserve_price_shape():
    got = _run("orders_reserve_price")
    assert len(got) == 5
    assert (got["exp_rev_micro"] >= 0).all()
    assert (np.diff(got["exp_rev_micro"].to_numpy()) <= 0).all()


def test_james_stein_contracts():
    got = _run("lineitem_james_stein")
    assert got["shrink_micro"].between(0, 1_000_000).all()
    raw = got["raw_mean_micro"].to_numpy(np.float64)
    js = got["js_mean_micro"].to_numpy(np.float64)
    grand = raw.mean()
    assert (np.abs(js - grand) <= np.abs(raw - grand) + 2).all()


def test_energy_distance_nonnegative():
    got = _run("events_energy_distance")
    assert (got["e_stat_micro"] >= -1).all()


def test_shapley_exposure_positive():
    got = _run("events_shapley_attribution")
    assert len(got) == 4
    assert (got["n_exposed"] > 0).all()


def test_gravity_slopes_plausible():
    got = _run("nation_gravity_fit")
    assert got["r2_micro"].between(0, 1_000_000).all()
    assert abs(int(got["b1_micro"].iloc[0]) - 1_000_000) < 900_000


def test_garch_max_dominates_final():
    got = _run("events_garch_filter")
    assert (got["sigma_max_micro"] >= got["sigma_final_micro"]).all()


def test_bass_shape():
    # sf0.01 guarantees >= 4 adoption days (sf0.001 may legitimately be empty)
    got = _run("events_bass_diffusion", "/root/testdata/sf0.01")
    assert int(got["n_days"].iloc[0]) > 0


def test_selectivity_topk():
    got = _run("events_selectivity_audit")
    assert len(got) <= 10
    assert (got["act_micro"] > 0).all()


def test_m_of_n_consistency():
    got = _run("events_m_of_n_alerts")
    assert (got["n_alerts"] <= got["n_days"]).all()
    none = got[got["n_alerts"] == 0]
    assert (none["first_alert_day"] == 0).all()


def test_usl_positive():
    got = _run("events_usl_fit")
    if len(got):
        assert int(got["lambda_micro"].iloc[0]) > 0


def test_profile_similarity_bounds():
    got = _run("nation_profile_similarity")
    assert got["cos_micro"].between(0, 1_000_000).all()
    assert (got["n1"] < got["n2"]).all()
