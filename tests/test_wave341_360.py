"""Edge-case tests for waves 341-360: mobility row-closure, asymmetry
count bounds, extreme-day closure, tool-density bounds, retention
bounds, duplicate-vector arithmetic, flash-crowd bounds, BCG closure,
churn-curve bounds, outlier concentration bounds, transitivity bounds,
Qn/MAD positivity, peak-drift bounds, brand-entry monotone dates,
tenure-corr bounds, timing-divergence nonnegativity, bloom-planner
monotone bits, admission-curve monotonicity, relative-contrast bounds,
error-propagation bounds, continuity bounds, peak-surprise bounds,
tail-dependence bounds, activation bounds, lifetime-shape closure,
timing-shift bounds, quality-drift bounds, gap-value bounds, schema
census fill bounds, weekend-lift bounds, bimodality coefficient range,
latency-corr range, Markov-order gap sign, spend-trend closure,
monetization bounds, discount-by-dow closure, tail-estimator ordering,
vocab-drift Jaccard bounds, rhythm-ACF range, seasonality peak range.
Value contracts are enforced by the parametrized oracle gate; these pin
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


def test_activity_mobility_row_closure():
    got = _run("users_activity_mobility")
    if len(got):
        assert set(got["from_tercile"]) <= {0, 1, 2}
        assert set(got["to_tercile"]) <= {0, 1, 2}
        for _, sub in got.groupby("from_tercile"):
            assert abs(int(sub["row_share_micro"].sum()) - 1_000_000) <= 4


def test_price_asymmetry_counts():
    got = _run("part_price_asymmetry")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_ups"]) >= 0 and int(r["n_downs"]) >= 0
        assert int(r["mean_up_milli"]) >= 0
        assert int(r["mean_down_milli"]) >= 0


def test_extreme_day_closure():
    got = _run("events_extreme_day_timing")
    if len(got):
        assert set(got["dow"]) <= set(range(7))
        assert abs(int(got["share_micro"].sum()) - 1_000_000) <= 8
        assert (got["chi2_micro"] >= 0).all()


def test_tool_density_by_outcome():
    got = _run("conv_tool_density_by_outcome")
    if len(got):
        assert set(got["has_error"]) <= {0, 1}
        assert (got["n_tool_turns"] <= got["n_turns"]).all()


def test_retention_by_first_type_bounds():
    got = _run("users_retention_by_first_type")
    if len(got):
        assert (got["n_retained"] <= got["n_users"]).all()
        assert got["rate_micro"].between(0, 1_000_000).all()


def test_duplicate_vectors_arithmetic():
    got = _run("emb_duplicate_vectors")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_distinct"]) <= int(r["n_vecs"])
        assert int(r["n_dup_vecs"]) >= 2 * int(r["n_dup_groups"]) or (
            int(r["n_dup_groups"]) == 0
        )
        # dup vectors = total - distinct + groups (each group keeps one)
        assert (
            int(r["n_dup_vecs"])
            == int(r["n_vecs"]) - int(r["n_distinct"]) + int(r["n_dup_groups"])
            or int(r["n_dup_groups"]) == 0
        )


def test_flash_crowd_bounds():
    got = _run("users_flash_crowd")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_personal_peak"]) <= int(r["n_users_on_peak"])
        assert 0 <= int(r["share_micro"]) <= 1_000_000


def test_bcg_quadrants_closure():
    got = _run("part_brand_bcg_quadrants")
    if len(got):
        assert abs(int(got["share_micro"].sum()) - 1_000_000) <= 4
        assert (got["n_brands"] >= 0).all()


def test_recency_churn_curve_bounds():
    got = _run("users_recency_churn_curve")
    if len(got):
        assert (got["n_returned"] <= got["n_users"]).all()
        assert got["rate_micro"].between(0, 1_000_000).all()


def test_outlier_concentration_bounds():
    got = _run("events_outlier_user_concentration")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_users_with"]) <= int(r["n_outliers"])
        assert 0 <= int(r["hhi_outlier_micro"]) <= 1_000_000


def test_nation_transitivity_bounds():
    got = _run("nation_transitivity")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_closed"]) <= int(r["n_paths"])
        assert 0 <= int(r["transitivity_micro"]) <= 1_000_000


def test_qn_scale_positive():
    got = _run("events_qn_scale")
    if len(got):
        r = got.iloc[0]
        assert int(r["qn_scale"]) >= 0 and int(r["mad_scale"]) >= 0
        assert int(r["n_pairs"]) == int(r["n_days"]) * (int(r["n_days"]) - 1) // 2


def test_peak_weekday_drift_bounds():
    got = _run("events_peak_weekday_drift")
    if len(got):
        r = got.iloc[0]
        assert 1 <= int(r["n_distinct_peaks"]) <= 7
        assert 0 <= int(r["modal_peak_dow"]) <= 6


def test_supplier_brand_entry_monotone():
    got = _run("supplier_brand_entry")
    if len(got):
        assert (got["n_new_pairs"] <= got["n_active_pairs"]).all()
        assert got["ship_year"].is_monotonic_increasing


def test_tenure_diversity_corr_shape():
    got = _run("users_tenure_diversity_corr")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_users"]) >= 3
        assert int(r["mean_tenure_milli"]) >= 0


def test_type_timing_divergence_nonneg():
    got = _run("events_type_timing_divergence")
    if len(got):
        assert (got["chi2_micro"] >= 0).all()
        assert (got["chi2_per_n_micro"] >= 0).all()


def test_bloom_planner_monotone():
    got = _run("docs_bloom_planner")
    if len(got) >= 2:
        # tighter FPR target needs at least as many bits
        assert got["m_bits"].is_monotonic_increasing or (
            got["m_bits"].is_monotonic_decreasing
        )
        assert (got["k_hashes"] >= 1).all()


def test_lateness_admission_monotone():
    got = _run("events_lateness_admission_curve")
    if len(got) >= 2:
        g = got.sort_values("lateness_us")
        assert g["n_admitted"].is_monotonic_increasing
        assert g["share_micro"].is_monotonic_increasing
        assert g["share_micro"].between(0, 1_000_000).all()


def test_relative_contrast_bounds():
    got = _run("emb_relative_contrast")
    if len(got):
        r = got.iloc[0]
        assert int(r["min_rc_micro"]) <= int(r["mean_rc_micro"])
        assert int(r["n_hard"]) <= int(r["n"])


def test_error_propagation_bounds():
    got = _run("conv_error_propagation")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_next_err"]) <= int(r["n_tool_err"])
        assert 0 <= int(r["prop_micro"]) <= 1_000_000
        assert 0 <= int(r["baseline_micro"]) <= 1_000_000


def test_turn_continuity_bounds():
    got = _run("conv_turn_continuity")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_with_gaps"]) <= int(r["n_convs"])
        assert int(r["n_with_dups"]) <= int(r["n_convs"])


def test_peak_surprise_bounds():
    got = _run("events_peak_surprise")
    if len(got):
        r = got.iloc[0]
        assert int(r["peak_count"]) >= 0
        assert int(r["lambda_micro"]) >= 0
        assert int(r["expected_days_nano"]) >= 0


def test_series_tail_dependence_bounds():
    got = _run("events_series_tail_dependence")
    if len(got):
        assert (got["n_joint"] <= got[["na_tail", "nb_tail"]].min(axis=1)).all()


def test_activation_curve_bounds():
    got = _run("users_activation_curve")
    if len(got):
        assert (got["n_retained"] <= got["n_users"]).all()
        assert got["rate_micro"].between(0, 1_000_000).all()


def test_lifetime_shape_closure():
    got = _run("users_lifetime_shape")
    if len(got):
        assert abs(int(got["share_micro"].sum()) - 1_000_000) <= 4
        assert (got["n_users"] >= 0).all()


def test_value_timing_shift_bounds():
    got = _run("events_value_timing_shift")
    if len(got):
        r = got.iloc[0]
        assert 0 <= int(r["l1_micro"]) <= 2_000_000
        assert 0 <= int(r["peak_hour_by_count"]) <= 23
        assert 0 <= int(r["peak_hour_by_value"]) <= 23


def test_quality_drift_bounds():
    got = _run("docs_quality_drift")
    if len(got):
        assert (got["n_pass"] <= got["n_docs"]).all()
        assert got["rate_micro"].between(0, 1_000_000).all()
        assert set(got["id_decile"]) <= set(range(10))


def test_gap_value_corr_range():
    got = _run("customer_gap_value_corr")
    if len(got):
        assert abs(int(got.iloc[0]["r_micro"])) <= 1_000_001


def test_props_schema_census_bounds():
    got = _run("events_props_schema_census")
    if len(got):
        assert (got["n_rows"] <= got["n_total"]).all()
        assert got["fill_rate_micro"].between(0, 1_000_000).all()


def test_weekend_lift_trend_bounds():
    got = _run("events_weekend_lift_trend")
    if len(got):
        assert got["weekend_share_micro"].between(0, 1_000_000).all()
        assert (got["n"] > 0).all()


def test_value_bimodality_range():
    got = _run("users_value_bimodality")
    if len(got):
        # Sarle's bimodality coefficient lives in (0, 1]
        assert 0 < int(got.iloc[0]["bc_micro"]) <= 1_000_000


def test_latency_quantity_corr_range():
    got = _run("lineitem_latency_quantity_corr")
    if len(got):
        assert abs(int(got.iloc[0]["r_micro"])) <= 1_000_001


def test_markov_order_gap_nonneg():
    got = _run("events_markov_order_test")
    if len(got):
        r = got.iloc[0]
        # conditioning on more context can only reduce entropy
        assert int(r["h2_micro"]) <= int(r["h1_micro"]) + 1
        assert int(r["gap_micro"]) >= -1
        assert int(r["h1_micro"]) >= 0


def test_spend_trend_closure():
    got = _run("customer_spend_trend_census")
    if len(got):
        assert list(got["trend"]) == ["declining", "flat", "growing"]
        assert abs(int(got["share_micro"].sum()) - 1_000_000) <= 4


def test_monetization_skew_bounds():
    got = _run("users_monetization_skew")
    if len(got):
        r = got.iloc[0]
        assert 0 <= int(r["tv_micro"]) <= 1_000_000
        assert int(r["n_over_monetized"]) <= int(r["n_users"])
        assert 0 <= int(r["over_share_micro"]) <= 1_000_000


def test_discount_by_dow_closure():
    got = _run("lineitem_discount_by_dow")
    if len(got):
        assert set(got["dow"]) <= set(range(7))
        # deviations from the overall mean roughly cancel (weighted)
        w = (got["n"] * got["dev_milli"]).sum()
        assert abs(int(w)) <= int(got["n"].sum())


def test_moment_tail_estimator_ordering():
    got = _run("orders_moment_tail_estimator")
    if len(got):
        r = got.iloc[0]
        assert int(r["k"]) >= 5
        assert int(r["thr_cents"]) > 0
        assert int(r["hill_micro"]) >= 0
        # moment estimator <= Hill + 1 by construction (gamma = M1+1-...)
        assert int(r["moment_micro"]) <= int(r["hill_micro"]) + 1_000_000


def test_vocab_drift_jaccard_bounds():
    got = _run("docs_vocab_drift_curve")
    if len(got):
        assert got["jaccard_micro"].between(0, 1_000_000).all()
        assert set(got["decile_from"]) <= set(range(9))
        assert (got["n_types_from"] > 0).all()


def test_hourly_rhythm_acf_range():
    got = _run("events_hourly_rhythm_acf")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_hours"]) >= 200
        assert abs(int(r["r24_micro"])) <= 1_000_001
        assert abs(int(r["r168_micro"])) <= 1_000_001


def test_volume_value_seasonality_range():
    got = _run("orders_volume_value_seasonality")
    if len(got):
        r = got.iloc[0]
        assert 1 <= int(r["peak_month_volume"]) <= 12
        assert 1 <= int(r["peak_month_value"]) <= 12
        assert abs(int(r["spearman_micro"])) <= 1_000_001
