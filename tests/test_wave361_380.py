"""Edge-case tests for waves 361-380: Kruskal tie-corrected ordering,
odds-ratio 2x2 consistency, Wilcoxon rank-sum bounds, MI nonnegativity,
JSD bounds, ICC range, RFM closure, CMS overestimate invariant, HLL
register bounds, ABC ordering, Bloom FPR bounds, histogram-quantile
error consistency, Weibull positivity, Welch pairing, MinHash estimate
bounds, winsor/trim ordering, latency order stats, SimHash census
arithmetic, day-Jaccard bounds, Tukey fence counts, cohort base cells,
segment gap medians, HHI bounds, EWMA/CUSUM alarm bounds, JL distortion
ordering, association bounds, skyline monotonicity, rollup closure,
funnel monotonicity, stickiness bounds, Burrows symmetry count, degree
census totals, KM survival monotone probes, residual top-5, log-rank
nonnegativity, quantile band ordering, McNemar counts, Heaps beta
range. Value contracts are enforced by the parametrized oracle gate;
these pin semantics."""

import numpy as np
import pandas as pd

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _run(name, path=SF):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def test_kruskal_tie_correction_inflates():
    got = _run("customer_mktsegment_kruskal")
    if len(got):
        r = got.iloc[0]
        # tie correction divides by C <= 1 so H' >= H
        assert int(r["h_tied_micro"]) >= int(r["h_micro"])
        assert int(r["n_groups"]) >= 2


def test_return_odds_2x2_consistency():
    got = _run("lineitem_return_odds_by_tax")
    if len(got):
        r = got.iloc[0]
        assert (
            int(r["n_high_ret"]) + int(r["n_high_ok"])
            + int(r["n_low_ret"]) + int(r["n_low_ok"]) > 0
        )
        assert 0 <= int(r["rate_high_micro"]) <= 1_000_000
        assert 0 <= int(r["rate_low_micro"]) <= 1_000_000
        assert int(r["or_micro"]) >= 0


def test_wilcoxon_rank_sum_bounds():
    got = _run("events_wilcoxon_weekend")
    if len(got):
        r = got.iloc[0]
        n = int(r["n_eff"])
        # doubled rank sum of positives is at most the full doubled sum
        assert 0 <= int(r["w_plus2"]) <= 2 * n * (n + 1) // 2 + n
        assert n <= int(r["n_weeks"])


def test_word_mi_nonneg():
    got = _run("part_type_word_mi")
    if len(got):
        r = got.iloc[0]
        assert int(r["mi_micro"]) >= -1
        assert int(r["nmi_micro"]) <= 1_000_001


def test_wordlen_jsd_bounds():
    got = _run("docs_wordlen_js_divergence")
    if len(got):
        # JSD (natural log) is bounded by ln 2
        assert (got["jsd_micro"] <= 693_148).all()
        assert (got["jsd_micro"] >= 0).all()
        assert (got["source_a"] < got["source_b"]).all()


def test_icc_range():
    got = _run("customer_nation_icc")
    if len(got):
        r = got.iloc[0]
        assert int(r["f_micro"]) >= 0
        assert -1_000_001 <= int(r["icc_micro"]) <= 1_000_001


def test_rfm_closure():
    got = _run("orders_rfm_segmentation")
    if len(got):
        assert set(got["r_score"]) <= {0, 1, 2}
        assert set(got["f_score"]) <= {0, 1, 2}
        assert set(got["m_score"]) <= {0, 1, 2}
        assert int(got["n_customers"].sum()) > 0


def test_cms_never_underestimates():
    got = _run("events_cms_accuracy")
    if len(got):
        assert (got["est_n"] >= got["true_n"]).all()
        assert (got["over_n"] >= 0).all()
        assert len(got) <= 10


def test_hll_register_bounds():
    got = _run("events_hll_accuracy")
    if len(got):
        r = got.iloc[0]
        assert 1 <= int(r["n_registers_hit"]) <= 64
        assert int(r["est_n"]) > 0


def test_abc_ordering():
    got = _run("orders_abc_analysis")
    if len(got):
        assert list(got["abc_class"]) == sorted(got["abc_class"])
        assert abs(int(got["revenue_share_micro"].sum()) - 1_000_000) <= 4
        byc = got.set_index("abc_class")
        if "A" in byc.index and "C" in byc.index:
            assert (
                int(byc.loc["A", "revenue_cents"])
                >= int(byc.loc["C", "revenue_cents"])
            )


def test_bloom_fpr_bounds():
    got = _run("events_bloom_fpr_measured")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_bits_set"]) <= 4096
        assert 0 <= int(r["fpr_micro"]) <= 1_000_000
        assert 0 <= int(r["fpr_theory_micro"]) <= 1_000_000


def test_hist_quantile_error_consistency():
    got = _run("events_hist_quantile_accuracy")
    if len(got):
        for _, r in got.iterrows():
            assert abs(
                int(r["est_cents_micro"]) - int(r["exact_cents"]) * 1_000_000
            ) - int(r["abs_err_cents_micro"]) <= 2


def test_weibull_shape_positive():
    got = _run("users_gap_weibull_shape")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_distinct"]) <= int(r["n_gaps"])
        assert int(r["shape_milli"]) > 0  # gaps are positive-support


def test_welch_nation_pairing():
    got = _run("nation_balance_gap_welch")
    if len(got):
        assert (got["n_supp"] >= 2).all()
        assert (got["n_cust"] >= 2).all()
        assert (got["df_milli"] > 0).all()


def test_minhash_estimate_bounds():
    got = _run("docs_minhash_jaccard_accuracy")
    if len(got):
        r = got.iloc[0]
        assert 0 <= int(r["n_matches"]) <= 64
        assert int(r["est_jaccard_micro"]) == int(
            np.floor(int(r["n_matches"]) / 64 * 1_000_000 + 0.5)
        )


def test_robust_means_ordering():
    got = _run("customer_acctbal_robust_means")
    if len(got):
        r = got.iloc[0]
        # winsorizing clips tails toward the center: all three finite
        assert int(r["k_tail"]) == int(r["n"]) // 20
        for c in ("mean_micro", "winsor_mean_micro", "trim_mean_micro"):
            assert abs(int(r[c])) < 10_000_000_000


def test_response_latency_order_stats():
    got = _run("conv_response_latency")
    if len(got):
        r = got.iloc[0]
        assert int(r["median_us"]) <= int(r["p90_us"])
        assert int(r["n_pairs"]) > 0


def test_simhash_census_arithmetic():
    got = _run("docs_simhash_collisions")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_distinct_sig"]) <= int(r["n_docs"])
        assert int(r["max_group"]) >= 1
        assert int(r["n_docs_in_collisions"]) >= 2 * int(
            r["n_collision_groups"]
        ) or int(r["n_collision_groups"]) == 0


def test_day_jaccard_bounds():
    got = _run("events_user_day_jaccard")
    if len(got):
        assert (
            got["n_inter"] <= got[["n_today", "n_next"]].min(axis=1)
        ).all()
        assert got["jaccard_micro"].between(0, 1_000_000).all()


def test_tukey_fence_counts():
    got = _run("events_tukey_fences_by_type")
    if len(got):
        assert (got["q1_cents"] <= got["q3_cents"]).all()
        assert (got["n_low_out"] + got["n_high_out"] <= got["n"]).all()


def test_cohort_base_cells():
    got = _run("orders_cohort_revenue")
    if len(got):
        assert (got["cohort_year"] <= got["order_year"]).all()
        diag = got[got["cohort_year"] == got["order_year"]]
        assert (diag["vs_first_micro"] == 1_000_000).all()


def test_segment_gap_medians():
    got = _run("orders_gap_by_segment")
    if len(got):
        assert (got["median_gap_days"] >= 0).all()
        assert (got["n_gaps"] > 0).all()


def test_brand_hhi_bounds():
    got = _run("lineitem_brand_supplier_hhi")
    if len(got):
        assert got["hhi_micro"].between(0, 1_000_001).all()
        assert (got["top_share_micro"] <= 1_000_000).all()
        # HHI >= 1/n_suppliers and >= top_share^2 (scaled)
        assert (
            got["hhi_micro"] * got["n_suppliers"] >= 999_990
        ).all()


def test_ewma_alarm_bounds():
    got = _run("events_ewma_anomaly_days")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_scored"]) == int(r["n_days"]) - 1
        assert int(r["n_high"]) + int(r["n_low"]) <= int(r["n_scored"])


def test_cusum_bounds():
    got = _run("events_cusum_alarm_census")
    if len(got):
        r = got.iloc[0]
        assert int(r["max_cusum_milli"]) >= 0
        assert int(r["n_alarms"]) <= int(r["n_days"])
        assert int(r["h_milli"]) >= 0


def test_disc_qty_mi_nonneg():
    got = _run("lineitem_discount_quantity_mi")
    if len(got):
        assert int(got.iloc[0]["mi_micro"]) >= -1


def test_jl_distortion_ordering():
    got = _run("emb_jl_pair_distortion")
    if len(got):
        r = got.iloc[0]
        assert int(r["mean_abs_dev_micro"]) <= int(r["max_abs_dev_micro"])
        assert int(r["k"]) == 8


def test_segment_priority_assoc_bounds():
    got = _run("orders_segment_priority_assoc")
    if len(got):
        r = got.iloc[0]
        assert int(r["chi2_micro"]) >= 0
        assert 0 <= int(r["cramers_v_micro"]) <= 1_000_001


def test_skyline_monotone():
    got = _run("orders_customer_skyline")
    if len(got) >= 2:
        g = got.sort_values("freq")
        # along the Pareto front, monetary strictly decreases as
        # frequency increases
        assert g["monetary_cents"].is_monotonic_decreasing
        assert (g["n_customers_at_point"] >= 1).all()


def test_rollup_closure():
    got = _run("sales_region_rollup")
    if len(got):
        total = got[got["level"] == "total"]
        regions = got[got["level"] == "region"]
        nations = got[got["level"] == "nation"]
        assert len(total) == 1
        assert int(regions["revenue_cents"].sum()) == int(
            total.iloc[0]["revenue_cents"]
        )
        assert int(nations["revenue_cents"].sum()) == int(
            total.iloc[0]["revenue_cents"]
        )


def test_funnel_monotone():
    got = _run("events_funnel_ordered")
    if len(got):
        g = got.sort_values("step_idx")
        n = g["n_users"].to_numpy()
        assert all(n[i] >= n[i + 1] for i in range(len(n) - 1))
        assert (g["conv_from_first_micro"] <= 1_000_000).all()


def test_stickiness_bounds():
    got = _run("users_dau_mau_stickiness")
    if len(got):
        assert got["stickiness_micro"].between(0, 1_000_000).all()
        assert (got["mau"] > 0).all()


def test_burrows_pair_count():
    got = _run("docs_burrows_delta_src")
    if len(got):
        assert (got["delta_milli"] >= 0).all()
        assert (got["n_words_used"] <= 50).all()


def test_degree_census_totals():
    got = _run("supplier_part_degree_census")
    if len(got):
        # sum of degree*n_nodes equals the edge count on both sides
        e_part = int(
            (got[got["side"] == "part"]["degree"]
             * got[got["side"] == "part"]["n_nodes"]).sum()
        )
        e_supp = int(
            (got[got["side"] == "supplier"]["degree"]
             * got[got["side"] == "supplier"]["n_nodes"]).sum()
        )
        assert e_part == e_supp


def test_km_survival_monotone_probes():
    got = _run("users_km_survival")
    if len(got):
        r = got.iloc[0]
        assert (
            int(r["s_1min_micro"]) >= int(r["s_1h_micro"])
            >= int(r["s_1day_micro"])
        )
        assert int(r["s_1min_micro"]) <= 1_000_000


def test_type_hour_residual_top5():
    got = _run("events_type_hour_residuals")
    if len(got):
        assert len(got) <= 5
        assert got["hr"].between(0, 23).all()


def test_logrank_nonneg():
    got = _run("events_logrank_activity_split")
    if len(got):
        r = got.iloc[0]
        assert int(r["chi2_micro"]) >= 0
        assert int(r["exp_a_milli"]) >= 0


def test_balance_quantile_ordering():
    got = _run("customer_balance_quantiles_by_segment")
    if len(got):
        assert (got["p10_cents"] <= got["p50_cents"]).all()
        assert (got["p50_cents"] <= got["p90_cents"]).all()


def test_mcnemar_counts():
    got = _run("users_mcnemar_months")
    if len(got):
        r = got.iloc[0]
        assert int(r["ym_first"]) < int(r["ym_last"])
        assert (
            int(r["n_both"]) + int(r["n_first_only"])
            + int(r["n_last_only"]) <= int(r["n_users"])
        )


def test_heaps_beta_range():
    got = _run("docs_heaps_law")
    if len(got):
        r = got.iloc[0]
        # sublinear vocabulary growth (0 when the tiny synthetic
        # vocabulary saturates in the first decile)
        assert 0 <= int(r["beta_milli"]) <= 1_000
        assert int(r["n_points"]) >= 3
